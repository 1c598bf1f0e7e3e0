"""Contract tests for the Turi and MyMediaLite adapters, run against a
fake ``turicreate`` module and a fake ``item_recommendation`` CLI (the
real deps are absent here).

The adapters own everything outside the external tool: SFrame/side-info
id remapping, recommendation reshaping, cold-start ``new_item_data``
plumbing (reference ``external/turi/turiwrapper.py:6-203``); train-CSV
dump, CLI command assembly, text-model parsing, factor remapping and QR
re-orthogonalized folding-in (reference
``external/mymedialite/mmlwrapper.py:34-206``).
"""
import numpy as np
import pandas as pd
import pytest

import _fake_mml
import _fake_turicreate

tc_mod = _fake_turicreate.install()
pytestmark = pytest.mark.skipif(
    "fake" not in str(getattr(tc_mod, "__version__", "")),
    reason="real turicreate installed; contract tests target the fake")

from polara_tpu.data import RecommenderData  # noqa: E402
from polara_tpu.data.coldstart import ItemColdStartData  # noqa: E402
from polara_tpu.models.external.mymedialite import (  # noqa: E402
    MyMediaLiteWrapper, parse_mml_model, remap_factors)
from polara_tpu.models.external.turi import (  # noqa: E402
    TuriColdStartRecommender, TuriFactorizationRecommender)

N_USERS, N_ITEMS = 40, 25
GENRES = ["action", "comedy", "drama", "horror"]


def make_events(seed=0):
    rs = np.random.RandomState(seed)
    rows = []
    for user in range(N_USERS):
        items = rs.choice(N_ITEMS, size=rs.randint(6, 12), replace=False)
        for item in items:
            rows.append((user, item, rs.randint(1, 6)))
    return pd.DataFrame(rows, columns=["userid", "movieid", "rating"])


def make_features(seed=1):
    rs = np.random.RandomState(seed)
    return pd.DataFrame(
        {"genres": [",".join(sorted(rs.choice(
            GENRES, size=rs.randint(1, 3), replace=False)))
            for _ in range(N_ITEMS)]},
        index=pd.RangeIndex(N_ITEMS, name="movieid"))


@pytest.fixture
def known_user_data():
    data = RecommenderData(make_events(), "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = False
    data.holdout_size = 2
    data.prepare()
    return data


@pytest.fixture(autouse=True)
def clean_journal():
    _fake_turicreate.FakeTuriModel.reset_journal()
    yield


def _journal(call):
    return [c for c in _fake_turicreate.FakeTuriModel.calls
            if c["call"] == call]


# --------------------------------------------------------------------------
# Turi
# --------------------------------------------------------------------------

def test_turi_build_and_recommend_contract(known_user_data):
    model = TuriFactorizationRecommender(known_user_data)
    model.verbose = False
    model.rank = 6
    model.build()

    (create,) = _journal("create")
    assert create["kind"] == "factorization"
    assert create["params"]["num_factors"] == 6
    assert create["params"]["target"] == "rating"
    assert create["params"]["side_data_factorization"] is True
    assert create["item_data_ids"] is None      # no side info passed
    assert create["n_train"] == len(known_user_data.training)

    recs = model.recommendations
    n_test_users = known_user_data.test.holdout["userid"].nunique()
    assert recs.shape == (n_test_users, model.topk)
    (rec_call,) = _journal("recommend")
    assert rec_call["exclude_known"] is True
    assert rec_call["n_users"] == n_test_users

    # filter_seen plumbs through to exclude_known
    model.filter_seen = False
    model.recommendations
    assert _journal("recommend")[-1]["exclude_known"] is False


def test_turi_side_info_remapped_to_internal_ids(known_user_data):
    features = make_features()
    model = TuriFactorizationRecommender(known_user_data,
                                         item_side_info=features)
    model.verbose = False
    model.build()

    (create,) = _journal("create")
    item_index = known_user_data.index.itemid
    item_index = getattr(item_index, "training", item_index)
    # the id column must be INTERNAL ids covering the training catalog
    assert sorted(create["item_data_ids"]) == \
        sorted(item_index["new"].tolist())
    assert "genres" in create["item_data_columns"]
    # and rows must align: feature of internal id i == feature of the
    # original item mapped to i
    frame = model.item_data.to_dataframe()
    back = item_index.set_index("new")["old"]
    for _, row in frame.iloc[:5].iterrows():
        original = back.loc[row["movieid"]]
        assert row["genres"] == features.loc[original, "genres"]


def test_turi_ranking_variant_and_rmse(known_user_data):
    model = TuriFactorizationRecommender(known_user_data)
    model.verbose = False
    model.ranking_optimization = True
    model.build()
    (create,) = _journal("create")
    assert create["kind"] == "ranking_factorization"
    assert create["params"]["ranking_regularization"] == 0.25
    assert create["params"]["num_sampled_negative_examples"] == 4

    rmse = model.evaluate_rmse()
    assert np.isfinite(rmse) and rmse >= 0
    (rmse_call,) = _journal("evaluate_rmse")
    assert rmse_call["n"] == len(known_user_data.test.holdout)


def test_turi_cold_start_new_item_data_plumbing():
    data = ItemColdStartData(make_events(), "userid", "movieid", "rating",
                             item_features=make_features(), seed=0,
                             verbose=False)
    data.prepare()
    features = make_features()
    model = TuriColdStartRecommender(data, item_side_info=features)
    model.verbose = False
    model.build()
    recs = model.recommendations

    n_cold = data.index.itemid.cold_start.shape[0]
    assert recs.shape == (n_cold, model.topk)
    known_users = set(data.index.userid.training["new"])
    assert set(np.unique(recs)) <= known_users

    (predict,) = _journal("predict")
    lower = data.index.itemid.training["new"].max() + 1
    # cold ids must be disjoint from the known catalog
    assert min(predict["new_item_ids"]) == lower
    assert len(predict["new_item_ids"]) == n_cold
    assert predict["new_item_columns"] == ["genres"]
    n_repr = data.index.userid.training.shape[0]
    assert predict["n_pairs"] == n_cold * n_repr


def test_turi_cold_start_pads_small_candidate_pool():
    # fewer representative users than topk: the adapter must pad to
    # (n_cold, topk) with -1 like the native cold-start mixins
    data = ItemColdStartData(make_events(), "userid", "movieid", "rating",
                             item_features=make_features(), seed=0,
                             verbose=False)
    data.test_sample = 2            # 2 representative users < topk
    data.prepare()
    model = TuriColdStartRecommender(data, item_side_info=make_features())
    model.verbose = False
    model.topk = 5
    model.build()
    recs = model.recommendations
    n_cold = data.index.itemid.cold_start.shape[0]
    assert recs.shape == (n_cold, 5)
    assert (recs[:, 2:] == -1).all()
    assert (recs[:, :2] >= 0).all()


def test_turi_side_info_reassignment_invalidates_sframe_cache():
    # round-3 review finding: swapping the side-info frame must rebuild
    # the SFrame, not reuse the stale one
    data = ItemColdStartData(make_events(), "userid", "movieid", "rating",
                             item_features=make_features(), seed=0,
                             verbose=False)
    data.prepare()
    features = make_features()
    model = TuriColdStartRecommender(data, item_side_info=features)
    model.verbose = False
    first = model.item_data
    assert first is model.item_data          # cached while unchanged
    model.item_side_info = features.copy()
    assert model.item_data is not first      # rebuilt from the new frame


# --------------------------------------------------------------------------
# MyMediaLite
# --------------------------------------------------------------------------

@pytest.fixture
def mml_dirs(tmp_path):
    library = _fake_mml.install(tmp_path / "mml")
    data_folder = tmp_path / "artifacts"
    data_folder.mkdir()
    return library, str(data_folder)


def _mml_model(data, dirs, method="BPRMF", **attrs):
    library, folder = dirs
    data.name = "testdata"
    model = MyMediaLiteWrapper(library, folder, method, data)
    model.verbose = False
    model.rank = 4
    for key, value in attrs.items():
        setattr(model, key, value)
    return model


def test_mml_cli_round_trip_and_factor_placement(known_user_data,
                                                 mml_dirs):
    # WRMF: no biases; orthogonalization off so raw placement is visible
    model = _mml_model(known_user_data, mml_dirs, method="WRMF",
                       orthogonal_factors=False, feedback_threshold=1)
    model.build()

    u = np.asarray(model.factors["userid"])
    v = np.asarray(model.factors["movieid"])
    n_users = known_user_data.index.userid.training["new"].max() + 1
    item_index = known_user_data.index.itemid
    item_index = getattr(item_index, "training", item_index)
    n_items = item_index["new"].max() + 1
    assert u.shape == (n_users, 4) and v.shape == (n_items, 4)
    # fake encodes value = old_id + f/100 (users), 2*old_id + f/100
    # (items); remap_factors must land every row on its framework id
    # even though the fake assigns internal ids in REVERSED order
    for uid in (0, 1, n_users - 1):
        np.testing.assert_allclose(
            u[uid], uid + np.arange(4) / 100, atol=1e-9)
    for iid in (0, n_items - 1):
        np.testing.assert_allclose(
            v[iid], 2 * iid + np.arange(4) / 100, atol=1e-9)
    assert model._items_biases is None


def test_mml_biases_parsed_and_scattered(known_user_data, mml_dirs):
    model = _mml_model(known_user_data, mml_dirs, method="BPRMF",
                       orthogonal_factors=False, feedback_threshold=1)
    model.build()
    item_index = known_user_data.index.itemid
    item_index = getattr(item_index, "training", item_index)
    n_items = item_index["new"].max() + 1
    biases = model._items_biases
    assert biases is not None and biases.shape == (n_items,)
    np.testing.assert_allclose(biases, 1000 + np.arange(n_items),
                               atol=1e-9)


def test_mml_orthogonalized_folding_and_recommendations(known_user_data,
                                                        mml_dirs):
    model = _mml_model(known_user_data, mml_dirs, method="BPRMF",
                       feedback_threshold=1)
    assert model.orthogonal_factors    # default: QR fold-in
    model.build()
    v = np.asarray(model.factors["movieid"])
    # orthonormal columns (bias column absorbed into the basis)
    np.testing.assert_allclose(v.T @ v, np.eye(v.shape[1]), atol=1e-5)

    recs = model.recommendations
    n_test_users = known_user_data.test.holdout["userid"].nunique()
    assert recs.shape == (n_test_users, model.topk)
    assert (recs >= 0).all() and (recs < v.shape[0]).all()


def test_mml_no_id_mapping_path(known_user_data, mml_dirs):
    model = _mml_model(known_user_data, mml_dirs, method="WRMF",
                       orthogonal_factors=False, positive_only=False,
                       feedback_threshold=1)
    assert "--no-id-mapping" in model._run_external(debug=True)
    model.build()
    u = np.asarray(model.factors["userid"])
    n_users = known_user_data.index.userid.training["new"].max() + 1
    assert u.shape == (n_users, 4)
    np.testing.assert_allclose(u[2], 2 + np.arange(4) / 100, atol=1e-9)


def test_mml_external_failure_raises(known_user_data, tmp_path):
    # nonexistent binary -> nonzero/failed call must raise
    data_folder = tmp_path / "artifacts"
    data_folder.mkdir()
    known_user_data.name = "testdata"
    model = MyMediaLiteWrapper(str(tmp_path / "missing"),
                               str(data_folder), "BPRMF",
                               known_user_data)
    model.verbose = False
    with pytest.raises((ValueError, OSError)):
        model.build()
