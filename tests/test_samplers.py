import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from polara_tpu.data import RecommenderData
from polara_tpu.data.mixins import SampledEvaluationMixin
from polara_tpu.models.svd import SVDModel
from polara_tpu.models.sampled import SampledEvaluationSVDMixin
from polara_tpu.ops.samplers import (sample_row_wise, sampled_scores,
                                     split_top_continuous)


class SampledData(SampledEvaluationMixin, RecommenderData):
    pass


class SampledSVD(SampledEvaluationSVDMixin, SVDModel):
    pass


class TestSampleRowWise:
    def test_never_samples_seen(self):
        rs = np.random.RandomState(0)
        n_rows, n_cols = 50, 40
        mask = rs.rand(n_rows, n_cols) < 0.4
        rows, cols = np.nonzero(mask)
        sampled = sample_row_wise(rows, cols, n_rows, n_cols, 10, seed=1)
        for r in range(n_rows):
            seen = set(cols[rows == r])
            assert not (set(sampled[r].tolist()) & seen)

    def test_no_replacement(self):
        rows = np.array([], dtype=int)
        cols = np.array([], dtype=int)
        sampled = sample_row_wise(rows, cols, 20, 30, 15, seed=0)
        for r in range(20):
            assert len(set(sampled[r].tolist())) == 15

    def test_raises_when_infeasible(self):
        rows = np.zeros(8, dtype=int)
        cols = np.arange(8)
        with pytest.raises(ValueError):
            sample_row_wise(rows, cols, 1, 10, 5)

    def test_roughly_uniform(self):
        # no exclusions: item frequencies should be about equal
        sampled = sample_row_wise(np.array([], int), np.array([], int),
                                  4000, 20, 5, seed=3)
        counts = np.bincount(sampled.ravel(), minlength=20)
        freq = counts / counts.sum()
        assert np.abs(freq - 1 / 20).max() < 0.01


def test_sampled_scores_match_factors():
    rs = np.random.RandomState(0)
    u = jnp.asarray(rs.randn(6, 3))
    v = jnp.asarray(rs.randn(30, 3))
    seen_rows = jnp.asarray(np.repeat(np.arange(6), 2), jnp.int32)
    seen_cols = jnp.asarray(rs.randint(0, 30, 12), jnp.int32)
    out = sampled_scores(u, v, seen_rows, seen_cols,
                         jnp.ones(12, bool), jax.random.key(0), 5)
    assert out.shape == (6, 5)
    assert np.isfinite(np.asarray(out)).all()


class TestSplitTopContinuous:
    def test_simple(self):
        tasks = np.array([1, 1, 2, 2])
        priorities = np.array([10, 20, 5, 30])
        topseq, lowseq, nonseq = split_top_continuous(tasks, priorities)
        # order by priority: idx3(t2), idx1(t1) -> all tasks seen
        assert set(np.array(tasks)[topseq]) == {1, 2}
        assert 3 in topseq and 1 in topseq
        assert set(lowseq) == {0, 2}
        assert nonseq == []

    def test_interrupting_instance_detected(self):
        # task 1 appears above AND below task 2's top -> earlier instance
        # of task 1 becomes non-sequential
        tasks = np.array([1, 2, 1])
        priorities = np.array([30, 10, 20])
        topseq, lowseq, nonseq = split_top_continuous(tasks, priorities)
        assert nonseq == [0]
        assert sorted(topseq) == [1, 2]
        assert lowseq == []


class TestSampledEvaluation:
    @pytest.fixture
    def data(self, synthetic_interactions):
        data = SampledData(synthetic_interactions, "userid", "movieid",
                           "rating", seed=0, verbose=False)
        data.warm_start = False
        data.holdout_size = 1
        data.update()
        return data

    def test_on_the_fly_sampled_mrr(self, data):
        model = SampledSVD(data)
        model.verbose = False
        model.rank = 6
        data.unseen_items_num = 10
        model.build()
        recs = model.recommendations
        n_test_users = data.test.holdout["userid"].nunique()
        assert recs.shape == (n_test_users, model.topk)
        # evaluation against the rebased holdout target works end-to-end
        scores = model.evaluate("relevance")
        assert 0 <= scores.hr <= 1

    def test_registered_unseen_lists(self, data, synthetic_interactions):
        model = SampledSVD(data)
        model.verbose = False
        model.rank = 6
        model.build()
        # register explicit per-user unseen lists in EXTERNAL id space
        user_index = data.index.userid.training
        item_index = data.index.itemid
        n_items = item_index.shape[0]
        rs = np.random.RandomState(5)
        seen_by_user = data.training.groupby("userid")["movieid"] \
                                    .apply(set).to_dict()
        lists = {}
        for _, row in user_index.iterrows():
            seen = seen_by_user.get(row["new"], set())
            pool = [item_index.loc[item_index["new"] == i, "old"].iloc[0]
                    for i in range(n_items) if i not in seen][:8]
            lists[row["old"]] = rs.permutation(pool)[:5]
        interactions = pd.Series(lists)
        data.set_unseen_interactions(interactions)
        recs = model.recommendations
        assert recs.shape[1] == model.topk
        # scores span holdout (1) + sampled (5) columns
        assert recs.max() < 1 + 5
