"""Factor checkpointing + display helpers."""
import numpy as np
import jax.numpy as jnp
import pytest

from polara_tpu.data import RecommenderData
from polara_tpu.datasets import make_synthetic_interactions
from polara_tpu.models import SVDModel
from polara_tpu.runtime.checkpoint import load_factors, save_factors
from polara_tpu.runtime.display import suppress_stdout


def test_save_load_roundtrip(tmp_path):
    path = str(tmp_path / "factors.npz")
    factors = {"user": np.arange(12.0).reshape(4, 3),
               "item": jnp.ones((5, 3)), "skipped": None}
    save_factors(path, factors, meta={"method": "test", "rank": 3})
    loaded, meta = load_factors(path)
    assert meta == {"method": "test", "rank": 3}
    assert loaded["skipped"] is None
    np.testing.assert_allclose(np.asarray(loaded["user"]), factors["user"])
    np.testing.assert_allclose(np.asarray(loaded["item"]), 1.0)


def test_model_save_load_resumes_without_rebuild(tmp_path):
    events = make_synthetic_interactions(n_users=40, n_items=25,
                                         n_events=600, seed=0)

    def make_data():
        data = RecommenderData(events, "userid", "movieid", "rating",
                               seed=0, verbose=False)
        data.warm_start = False
        data.test_ratio = 0
        data.holdout_size = 1
        data.prepare()
        return data

    data = make_data()
    model = SVDModel(data)
    model.rank = 6
    model.verbose = False
    recs = model.recommendations
    path = str(tmp_path / "svd.npz")
    model.save(path)

    fresh = SVDModel(make_data())
    fresh.rank = 6
    fresh.verbose = False
    meta = fresh.load(path)
    assert meta["method"] == "PureSVD" and meta["rank"] == 6
    assert fresh._is_ready
    np.testing.assert_array_equal(fresh.recommendations, recs)
    assert fresh.training_time == []  # no rebuild happened

    # rank truncation still works on loaded factors
    fresh.rank = 3
    assert fresh.factors["movieid"].shape[1] == 3


def test_save_unbuilt_raises(tmp_path):
    events = make_synthetic_interactions(n_users=20, n_items=15,
                                         n_events=200, seed=1)
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.prepare_training_only()
    model = SVDModel(data)
    with pytest.raises(ValueError, match="no trained factors"):
        model.save(str(tmp_path / "x.npz"))


def test_suppress_stdout(capsys):
    with suppress_stdout():
        print("hidden")
    print("visible")
    captured = capsys.readouterr()
    assert "hidden" not in captured.out
    assert "visible" in captured.out


def test_load_syncs_rank():
    events = make_synthetic_interactions(n_users=30, n_items=20,
                                         n_events=400, seed=2)
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 1
    data.prepare()
    model = SVDModel(data)
    model.rank = 8
    model.verbose = False
    model.build()
    path = "/tmp/_rank_sync.npz"
    model.save(path)

    fresh = SVDModel(data)  # default rank 10
    fresh.verbose = False
    fresh.load(path)
    assert fresh.rank == 8
    assert fresh.factors["movieid"].shape[1] == 8


def test_orbax_backend_roundtrip(tmp_path):
    from polara_tpu.runtime.checkpoint import (load_factors_orbax,
                                               save_factors_orbax)
    path = str(tmp_path / "ckpt")
    factors = {"u": np.arange(12.0).reshape(4, 3), "skipped": None}
    save_factors_orbax(path, factors, meta={"method": "orbax", "rank": 3})
    loaded, meta = load_factors_orbax(path)
    assert meta == {"method": "orbax", "rank": 3}
    assert loaded["skipped"] is None
    np.testing.assert_allclose(np.asarray(loaded["u"]), factors["u"])
