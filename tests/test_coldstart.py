"""Item cold-start subsystem: data split + model zoo."""
import numpy as np
import pandas as pd
import pytest

from polara_tpu.data.coldstart import (ItemColdStartData,
                                       ItemColdStartSimilarityData)
from polara_tpu.models.coldstart import (
    HybridSVDItemColdStart, LCEModelItemColdStart,
    PopularityModelItemColdStart, RandomModelItemColdStart,
    ScaledSVDItemColdStart, SimilarityAggregationItemColdStart,
    SVDModelItemColdStart)


N_USERS, N_ITEMS = 40, 25


def make_interactions(seed=0):
    rs = np.random.RandomState(seed)
    rows = []
    for user in range(N_USERS):
        items = rs.choice(N_ITEMS, size=rs.randint(5, 12), replace=False)
        for item in items:
            rows.append((user, item, rs.randint(1, 6)))
    return pd.DataFrame(rows, columns=["userid", "movieid", "rating"])


def make_features(seed=0):
    rs = np.random.RandomState(seed)
    genres = ["action", "comedy", "drama", "horror", "scifi"]
    return pd.DataFrame(
        {"genres": [sorted(rs.choice(genres, size=rs.randint(1, 3),
                                     replace=False).tolist())
                    for _ in range(N_ITEMS)]},
        index=pd.RangeIndex(N_ITEMS))


@pytest.fixture
def cold_data():
    data = ItemColdStartData(make_interactions(), "userid", "movieid",
                             "rating", item_features=make_features(),
                             seed=0, verbose=False)
    data.prepare()
    return data


def test_cold_split_structure(cold_data):
    holdout = cold_data.test.holdout
    assert cold_data.test.testset is None
    assert "movieid_cold" in holdout.columns
    cold_index = cold_data.index.itemid.cold_start
    # contiguous recoded ids aligned with the sorted holdout
    assert cold_index["new"].tolist() == list(range(len(cold_index)))
    assert set(holdout["movieid_cold"]) == set(cold_index["new"])
    assert (np.diff(holdout["movieid_cold"].values) >= 0).all()
    # cold items are absent from training
    training_items_old = set(cold_data.index.itemid.training["old"])
    assert not (set(cold_index["old"]) & training_items_old)
    # holdout userids are internal training codes
    n_train_users = cold_data.index.userid.training.shape[0]
    assert holdout["userid"].between(0, n_train_users - 1).all()


def test_cold_representative_users():
    data = ItemColdStartData(make_interactions(), "userid", "movieid",
                             "rating", seed=0, verbose=False)
    data.test_sample = 10
    data.prepare()
    repr_users = data.representative_users
    assert repr_users.shape[0] == 10
    holdout = data.test.holdout
    assert holdout["userid"].isin(repr_users["new"]).all()


def test_cold_fold_rotation():
    data = ItemColdStartData(make_interactions(), "userid", "movieid",
                             "rating", seed=0, verbose=False)
    data.prepare()
    fold1_cold = set(data.index.itemid.cold_start["old"])
    data.test_fold = 2
    data.update()
    fold2_cold = set(data.index.itemid.cold_start["old"])
    assert fold1_cold and fold2_cold
    assert not (fold1_cold & fold2_cold)


def test_cold_holdout_size_guard(cold_data):
    with pytest.raises(NotImplementedError):
        cold_data.holdout_size = 3
    with pytest.raises(ValueError):
        cold_data.warm_start = True


def _check_recs(model, data):
    recs = model.recommendations
    n_cold = data.index.itemid.cold_start.shape[0]
    assert recs.shape == (n_cold, model.topk)
    n_users = data.index.userid.training.shape[0]
    assert ((recs >= 0) & (recs < n_users)).all()
    return recs


def test_random_and_popularity_cold(cold_data):
    rnd = RandomModelItemColdStart(cold_data, seed=0)
    recs = _check_recs(rnd, cold_data)
    # no duplicate users within a row
    assert all(len(set(row)) == len(row) for row in recs)

    mp = PopularityModelItemColdStart(cold_data)
    recs = _check_recs(mp, cold_data)
    activity = cold_data.training["userid"].value_counts()
    top = recs[0]
    # returned users are sorted by activity
    counts = activity.reindex(top).values
    assert (np.diff(counts) <= 0).all()

    scores = mp.evaluate("relevance")
    assert np.isfinite(scores.precision)


def test_svd_cold(cold_data):
    svd = SVDModelItemColdStart(cold_data)
    svd.rank = 6
    svd.verbose = False
    recs = _check_recs(svd, cold_data)
    scores = svd.evaluate("ranking")
    assert np.isfinite(scores.ndcg)
    # rank truncation keeps transform consistent
    svd.rank = 4
    assert svd.item_features_embeddings.shape[1] == 4
    _check_recs(svd, cold_data)
    assert svd._transform_invgram.shape == (4, 4)


def test_scaled_svd_cold(cold_data):
    svd = ScaledSVDItemColdStart(cold_data)
    svd.rank = 5
    svd.verbose = False
    _check_recs(svd, cold_data)


def test_lce_cold(cold_data):
    lce = LCEModelItemColdStart(cold_data,
                                item_features=make_features())
    lce.rank = 5
    lce.max_iterations = 3
    lce.verbose = False
    _check_recs(lce, cold_data)


def _make_similarity_data():
    rs = np.random.RandomState(3)
    base = rs.rand(N_ITEMS, 4)
    sim = base @ base.T
    d = np.sqrt(np.diag(sim))
    sim = sim / d[:, None] / d[None, :]
    data = ItemColdStartSimilarityData(
        make_interactions(), "userid", "movieid", "rating",
        item_features=make_features(), seed=0, verbose=False,
        relations_matrices={"movieid": sim},
        relations_indices={"movieid": np.arange(N_ITEMS)})
    data.prepare()
    return data


def test_similarity_cold():
    data = _make_similarity_data()
    cold_sim = data.cold_items_similarity
    n_cold = data.index.itemid.cold_start.shape[0]
    n_seen = data.index.itemid.training.shape[0]
    assert cold_sim.shape == (n_cold, n_seen)

    model = SimilarityAggregationItemColdStart(data)
    model.verbose = False
    _check_recs(model, data)


def test_hybrid_svd_cold():
    data = _make_similarity_data()
    model = HybridSVDItemColdStart(data)
    model.rank = 5
    model.verbose = False
    _check_recs(model, data)
    scores = model.evaluate("ranking")
    assert np.isfinite(scores.ndcg)


def test_cold_beats_random(cold_data):
    """Feature fold-in must out-rank random user assignment."""
    svd = SVDModelItemColdStart(cold_data)
    svd.rank = 8
    svd.verbose = False
    svd.topk = 10
    rnd = RandomModelItemColdStart(cold_data, seed=42)
    rnd.topk = 10
    svd_score = svd.evaluate("relevance")
    rnd_score = rnd.evaluate("relevance")
    assert svd_score.recall >= rnd_score.recall


def test_small_candidate_pool_pads_to_topk(cold_data):
    cold_data.test_sample = 4  # fewer representative users than topk
    cold_data.update()
    n_cold = cold_data.index.itemid.cold_start.shape[0]

    rnd = RandomModelItemColdStart(cold_data, seed=0)
    rnd.topk = 10
    recs = rnd.recommendations
    assert recs.shape == (n_cold, 10)
    assert (recs[:, 4:] == -1).all()

    mp = PopularityModelItemColdStart(cold_data)
    mp.topk = 10
    recs = mp.recommendations
    assert recs.shape == (n_cold, 10)
    assert (recs[:, 4:] == -1).all()


def test_rank_sweep_resyncs_feature_transform(cold_data):
    """Regression: a rank sweep on a cold-start model must not leave the
    pinv-gram feature transform at the last swept rank.  After the sweep
    restores full-rank factors, evaluating at ANY rank (including the top
    rank, where the rank setter short-circuits) has to resync
    ``_transform_invgram``."""
    from polara_tpu.evaluation.pipelines import find_optimal_svd_rank

    model = SVDModelItemColdStart(cold_data)
    model.verbose = False
    best_rank, scores = find_optimal_svd_rank(
        model, [4, 8, 12], "precision", return_scores=True)
    assert len(scores) == 3

    # top rank: setter short-circuits (rank already 12 post-restore)
    model.rank = 12
    model._recommendations = None
    rel_top = model.evaluate("relevance")
    assert model._transform_invgram.shape[0] \
        == model.item_features_embeddings.shape[1]

    # intermediate rank: wider than the last swept rank (4)
    model.rank = 8
    model._recommendations = None
    rel_mid = model.evaluate("relevance")
    assert model._transform_invgram.shape[0] == 8
    assert np.isfinite(rel_top.precision) and np.isfinite(rel_mid.precision)
