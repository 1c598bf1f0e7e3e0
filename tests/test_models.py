import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp
from scipy.sparse.linalg import svds

from polara_tpu.data import RecommenderData
from polara_tpu.models import (SVDModel, ScaledSVD, PopularityModel,
                               RandomModel, CooccurrenceModel)


@pytest.fixture
def prepared_data(synthetic_interactions):
    data = RecommenderData(synthetic_interactions, "userid", "movieid",
                           "rating", seed=0, verbose=False)
    data.warm_start = False
    data.holdout_size = 2
    data.update()
    return data


def training_csr(data):
    idx, val, shp = data.to_coo()
    return sp.csr_matrix((val, (idx[:, 0], idx[:, 1])), shape=shp)


class TestSVDModel:
    def test_build_matches_scipy_svds(self, prepared_data):
        model = SVDModel(prepared_data)
        model.verbose = False
        model.rank = 6
        model.svd_tol = 1e-12
        model.build()
        csr = training_csr(prepared_data)
        _, s_ref, vt_ref = svds(csr.astype(np.float64), k=6)
        np.testing.assert_allclose(
            np.asarray(model.factors["singular_values"]), s_ref[::-1],
            rtol=1e-6)
        # item subspace agreement
        v = np.asarray(model.factors["movieid"])
        proj = vt_ref[::-1] @ v            # (k, k)
        np.testing.assert_allclose(np.abs(np.linalg.det(proj)), 1.0,
                                   atol=1e-6)

    def test_recommendations_match_numpy_pipeline(self, prepared_data):
        model = SVDModel(prepared_data)
        model.verbose = False
        model.rank = 6
        model.svd_tol = 1e-12
        model.topk = 5
        recs = model.recommendations
        holdout = prepared_data.test.holdout
        n_test_users = holdout["userid"].nunique()
        assert recs.shape == (n_test_users, 5)

        # oracle: numpy scoring with the model's own factors
        v = np.asarray(model.factors["movieid"])
        csr = training_csr(prepared_data)
        test_users = np.sort(holdout["userid"].unique())
        scores = (csr[test_users] @ v) @ v.T
        for row, u in enumerate(test_users):
            seen = csr[u].indices
            scores[row, seen] = -np.inf
        expect = np.argsort(-scores, axis=1)[:, :5]
        mismatch = (recs != expect).mean()
        assert mismatch < 0.01  # ties may re-order

    def test_rank_truncation_reuses_factors(self, prepared_data):
        model = SVDModel(prepared_data)
        model.verbose = False
        model.rank = 8
        model.build()
        v8 = np.asarray(model.factors["movieid"])
        model.rank = 4  # no rebuild needed
        assert model._is_ready
        np.testing.assert_array_equal(np.asarray(model.factors["movieid"]),
                                      v8[:, :4])
        model.rank = 10  # larger than built: must invalidate
        assert not model._is_ready

    def test_evaluate_returns_all_families(self, prepared_data):
        model = SVDModel(prepared_data)
        model.verbose = False
        model.rank = 4
        scores = model.evaluate()
        assert len(scores) == 4
        relevance, ranking, experience, hits = scores
        assert 0 <= relevance.recall <= 1
        assert 0 <= ranking.ndcg <= 1
        assert 0 <= experience.coverage <= 1
        assert hits.true_positive >= 0

    def test_switch_positive_enables_polarity(self, prepared_data):
        model = SVDModel(prepared_data)
        model.verbose = False
        model.rank = 4
        model.switch_positive = 4
        relevance, ranking = model.evaluate("main")
        assert relevance.fallout is not None
        assert ranking.ndcl is not None

    def test_data_change_invalidates(self, prepared_data):
        model = SVDModel(prepared_data)
        model.verbose = False
        model.rank = 4
        _ = model.recommendations
        assert model._is_ready
        prepared_data.test_fold = 1
        prepared_data.update()
        assert not model._is_ready
        assert model._recommendations is None


class TestScaledSVD:
    def test_scaling_changes_factors(self, prepared_data):
        plain = SVDModel(prepared_data)
        plain.verbose = False
        plain.rank = 4
        plain.build()
        scaled = ScaledSVD(prepared_data)
        scaled.verbose = False
        scaled.rank = 4
        scaled.build()
        s_plain = np.asarray(plain.factors["singular_values"])
        s_scaled = np.asarray(scaled.factors["singular_values"])
        assert not np.allclose(s_plain, s_scaled)

    def test_scaled_matrix_matches_reference_formula(self, prepared_data):
        scaled = ScaledSVD(prepared_data)
        scaled.verbose = False
        scaled.col_scaling = 0.6
        coo = scaled.get_training_matrix()
        csr = training_csr(prepared_data)
        nnz_col = csr.getnnz(axis=0).astype(float)
        factors = np.power(np.sqrt(nnz_col), 0.6 - 1,
                           where=nnz_col > 0, out=np.ones_like(nnz_col))
        expect = csr.toarray() * factors[None, :]
        np.testing.assert_allclose(np.asarray(coo.to_dense()), expect,
                                   rtol=1e-6)


class TestBaselines:
    def test_popularity_recommends_popular(self, prepared_data):
        model = PopularityModel(prepared_data)
        model.verbose = False
        model.filter_seen = False
        recs = model.recommendations
        counts = prepared_data.training.groupby("movieid").size()
        top_item = counts.idxmax()
        assert (recs[:, 0] == top_item).all()

    def test_popularity_by_feedback(self, prepared_data):
        model = PopularityModel(prepared_data)
        model.verbose = False
        model.by_feedback_value = True
        model.build()
        sums = prepared_data.training.groupby("movieid")["rating"].sum()
        np.testing.assert_allclose(np.asarray(model.item_scores),
                                   sums.values, rtol=1e-6)

    def test_random_model_is_seeded(self, prepared_data):
        m1 = RandomModel(prepared_data, seed=42)
        m1.verbose = False
        m2 = RandomModel(prepared_data, seed=42)
        m2.verbose = False
        np.testing.assert_array_equal(m1.recommendations,
                                      m2.recommendations)

    def test_cooccurrence_matches_scipy(self, prepared_data):
        model = CooccurrenceModel(prepared_data)
        model.verbose = False
        model.build()
        csr = training_csr(prepared_data)
        i2i = (csr.T @ csr).toarray()
        np.fill_diagonal(i2i, 0)
        np.testing.assert_allclose(np.asarray(model._i2i_matrix), i2i,
                                   rtol=1e-5)

    def test_filter_seen_excludes_training_items(self, prepared_data):
        model = PopularityModel(prepared_data)
        model.verbose = False
        recs = model.recommendations
        holdout = prepared_data.test.holdout
        test_users = np.sort(holdout["userid"].unique())
        training = prepared_data.training
        for row, u in enumerate(test_users):
            seen = set(training.loc[training["userid"] == u, "movieid"])
            assert not (set(recs[row]) & seen)


class TestWarmStartScoring:
    def test_svd_warm_start_end_to_end(self, synthetic_interactions):
        data = RecommenderData(synthetic_interactions, "userid", "movieid",
                               "rating", seed=0, verbose=False)
        data.update()  # default warm-start scenario
        model = SVDModel(data)
        model.verbose = False
        model.rank = 4
        scores = model.evaluate()
        assert len(scores) == 4

    def test_topk_rollback(self, synthetic_interactions):
        data = RecommenderData(synthetic_interactions, "userid", "movieid",
                               "rating", seed=0, verbose=False)
        data.update()
        model = SVDModel(data)
        model.verbose = False
        model.rank = 4
        model.topk = 10
        recs10 = model.recommendations.copy()
        r5 = model.evaluate("relevance", topk=5)
        np.testing.assert_array_equal(model.recommendations, recs10)
        r10 = model.evaluate("relevance", topk=10)
        assert r10.recall >= r5.recall


def test_multi_chunk_scoring_matches_single_chunk():
    """Forcing small chunks exercises the chunk-streaming path; results
    must equal the single-chunk run (XLA and fused backends)."""
    import numpy as np
    from polara_tpu import config as defaults
    from polara_tpu.data import RecommenderData
    from polara_tpu.datasets import make_synthetic_interactions
    from polara_tpu.models import SVDModel
    from polara_tpu.ops.scoring import ChunkedTestData

    events = make_synthetic_interactions(60, 40, 1000, seed=9)
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 1
    data.prepare()
    model = SVDModel(data)
    model.rank = 6
    model.verbose = False
    single = model.recommendations.copy()

    original_build = ChunkedTestData.build.__func__

    def chunked_build(cls, *args, **kwargs):
        kwargs["chunk_users"] = 7  # force 9 chunks
        return original_build(cls, *args, **kwargs)

    ChunkedTestData.build = classmethod(chunked_build)
    try:
        model._recommendations = None
        model._test_plan = None
        multi = model.recommendations.copy()
        np.testing.assert_array_equal(multi, single)

        saved = defaults.get_default("pallas_scoring")
        defaults.set_default("pallas_scoring", True)  # interpret off-TPU
        try:
            model._recommendations = None
            model._test_plan = None
            fused_multi = model.recommendations
            np.testing.assert_array_equal(fused_multi, single)
        finally:
            defaults.set_default("pallas_scoring", saved)
    finally:
        ChunkedTestData.build = classmethod(original_build)


def test_svd_past_budget_routes_to_split_streaming():
    """With a budget too small even for the COO intermediate, a
    single-device SVD build must route to the beyond-HBM streaming tier
    (head/tail split operator by default) and reproduce the dense-path
    factors and recommendations."""
    import jax.numpy as jnp

    from polara_tpu import config as defaults
    from polara_tpu.data import RecommenderData
    from polara_tpu.datasets import make_synthetic_interactions
    from polara_tpu.models import SVDModel
    from polara_tpu.ops.rsvd import principal_angles_max_sin

    events = make_synthetic_interactions(80, 50, 1500, seed=12)

    def build_model(data):
        model = SVDModel(data)
        model.rank = 6
        model.verbose = False
        model.compute_dtype = jnp.float64
        model.build()
        return model

    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 1
    data.prepare()
    dense_model = build_model(data)
    recs_dense = dense_model.recommendations.copy()

    old = defaults.get_default("hbm_score_budget_gb")
    defaults.set_default("hbm_score_budget_gb", 1e-7)
    try:
        split_model = build_model(data)
    finally:
        defaults.set_default("hbm_score_budget_gb", old)
    itemid = data.fields.itemid
    assert principal_angles_max_sin(dense_model.factors[itemid],
                                    split_model.factors[itemid]) < 1e-6
    agree = np.mean(np.sort(split_model.recommendations, axis=1)
                    == np.sort(recs_dense, axis=1))
    assert agree > 0.999
