"""Contract tests for the external adapter layer, run against a fake
``lightfm`` module (the real CPU extension is absent here).

The adapter owns everything outside the extension: feature stacking with
identity blocks, training-matrix assembly, warm/cold-start plumbing and
score reshaping (reference ``external/lightfm/lightfmwrapper.py:9-114``,
``coldstart/models.py:260-298``).  The fake journals every call so these
tests pin the adapter's side of the boundary.
"""
import numpy as np
import pandas as pd
import pytest

import _fake_lightfm

lightfm_mod = _fake_lightfm.install()
pytestmark = pytest.mark.skipif(
    "fake" not in str(getattr(lightfm_mod, "__version__", "")),
    reason="real lightfm installed; contract tests target the fake")

from polara_tpu.data import RecommenderData  # noqa: E402
from polara_tpu.data.coldstart import ItemColdStartData  # noqa: E402
from polara_tpu.models.external import LightFMWrapper  # noqa: E402
from polara_tpu.models.external.lightfm import (  # noqa: E402
    LightFMItemColdStart)

N_USERS, N_ITEMS = 50, 30
GENRES = ["action", "comedy", "drama", "horror"]


def make_events(seed=0):
    rs = np.random.RandomState(seed)
    rows = []
    for user in range(N_USERS):
        items = rs.choice(N_ITEMS, size=rs.randint(5, 12), replace=False)
        for item in items:
            rows.append((user, item, rs.randint(1, 6)))
    return pd.DataFrame(rows, columns=["userid", "movieid", "rating"])


def make_features(seed=1):
    rs = np.random.RandomState(seed)
    return pd.DataFrame(
        {"genres": [sorted(rs.choice(GENRES, size=rs.randint(1, 3),
                                     replace=False).tolist())
                    for _ in range(N_ITEMS)]},
        index=pd.RangeIndex(N_ITEMS))


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
    _fake_lightfm.FakeLightFM.reset_journal()
    yield


def _journal(call):
    return [c for c in _fake_lightfm.FakeLightFM.calls
            if c["call"] == call]


def test_fit_contract_feature_stacking(known_user_data):
    features = make_features()
    model = LightFMWrapper(known_user_data, item_features=features)
    model.verbose = False
    model.rank = 7
    model.loss = "bpr"
    model.build()

    (init,) = _journal("__init__")
    assert init["params"]["no_components"] == 7
    assert init["params"]["loss"] == "bpr"
    assert init["params"]["random_state"] == model.seed

    (fit,) = _journal("fit")
    n_items = known_user_data.index.itemid.shape[0]
    n_users = known_user_data.index.userid.training.shape[0]
    assert fit["interactions_shape"] == (n_users, n_items)
    assert fit["nnz"] == len(known_user_data.training)
    # identity block + one column per distinct genre label
    features = make_features()
    n_labels = len({g for row in features["genres"] for g in row})
    assert fit["item_features_shape"] == (n_items, n_items + n_labels)
    assert fit["item_features_shape"] == model._item_features_csr.shape
    assert fit["user_features_shape"] is None

    # stacked rows are row-normalized (LightFM feature convention)
    row_sums = np.asarray(model._item_features_csr.sum(axis=1)).ravel()
    np.testing.assert_allclose(row_sums, 1.0, rtol=1e-6)


def test_fit_partial_and_params_forwarding(known_user_data):
    model = LightFMWrapper(known_user_data)
    model.verbose = False
    model.fit_method = "fit_partial"
    model.fit_params = {"epochs": 3, "num_threads": 2}
    model.build()
    (fit,) = _journal("fit_partial")
    assert fit["kwargs"] == {"epochs": 3, "num_threads": 2}
    assert not _journal("fit")


def test_predict_scoring_contract(known_user_data):
    model = LightFMWrapper(known_user_data,
                           item_features=make_features())
    model.verbose = False
    recs = model.recommendations
    n_test_users = known_user_data.test.holdout["userid"].nunique()
    n_items = known_user_data.index.itemid.shape[0]
    assert recs.shape == (n_test_users, model.topk)

    (predict,) = _journal("predict")
    assert predict["n_pairs"] == n_test_users * n_items
    assert predict["item_features_shape"][0] == n_items

    # seen items are filtered from the results (state 3: the testset
    # is the training rows of the holdout users)
    seen = set(map(tuple, known_user_data.training[
        ["userid", "movieid"]].values.tolist()))
    test_users = np.sort(known_user_data.test.holdout["userid"].unique())
    for row, user in enumerate(test_users):
        for item in recs[row]:
            assert (user, int(item)) not in seen

    # deterministic under the same seed
    model2 = LightFMWrapper(known_user_data,
                            item_features=make_features())
    model2.verbose = False
    np.testing.assert_array_equal(model2.recommendations, recs)


def test_warm_start_not_supported():
    data = RecommenderData(make_events(), "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = True
    data.holdout_size = 2
    data.prepare()
    model = LightFMWrapper(data)
    model.verbose = False
    model.build()
    with pytest.raises(NotImplementedError):
        model.recommendations


def test_cold_start_adapter_contract():
    features = make_features()
    cold = ItemColdStartData(make_events(), "userid", "movieid", "rating",
                             seed=0, verbose=False, item_features=features)
    cold.prepare()
    model = LightFMItemColdStart(cold, item_features=features)
    model.verbose = False
    recs = model.recommendations

    n_cold = cold.index.itemid.cold_start.shape[0]
    n_users = cold.index.userid.training.shape[0]
    assert recs.shape == (n_cold, model.topk)
    assert ((recs >= 0) & (recs < n_users)).all()

    (predict,) = _journal("predict")
    assert predict["n_pairs"] == n_cold * n_users
    # cold features carry the zeroed identity block + shared label space:
    # same stacked width as the training-side feature matrix
    assert predict["item_features_shape"] == \
        (n_cold, model._item_features_csr.shape[1])


def test_cold_start_representative_user_mapping():
    features = make_features()
    cold = ItemColdStartData(make_events(), "userid", "movieid", "rating",
                             seed=0, verbose=False, item_features=features)
    cold.test_sample = 12
    cold.prepare()
    model = LightFMItemColdStart(cold, item_features=features)
    model.verbose = False
    recs = model.recommendations
    candidates = set(cold.representative_users["new"].values.tolist())
    assert set(np.unique(recs).tolist()) <= candidates
    (predict,) = _journal("predict")
    n_cold = cold.index.itemid.cold_start.shape[0]
    assert predict["n_pairs"] == n_cold * len(candidates)
