import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from polara_tpu.data import RecommenderData
from polara_tpu.models.mf import ProbabilisticMF
from polara_tpu.models.coffee import CoffeeModel
from polara_tpu.models.svd import SVDModel
from polara_tpu.ops.factorize import mf_train
from polara_tpu.ops.hooi import hooi, round_core, flatten_feedback_weights


@pytest.fixture
def prepared_data(synthetic_interactions):
    data = RecommenderData(synthetic_interactions, "userid", "movieid",
                           "rating", seed=0, verbose=False)
    data.warm_start = False
    data.holdout_size = 2
    data.update()
    return data


class TestMFTrain:
    def test_rmse_decreases_on_low_rank_data(self):
        rs = np.random.RandomState(0)
        p_true = rs.randn(50, 3)
        q_true = rs.randn(40, 3)
        dense = p_true @ q_true.T
        rows, cols = np.nonzero(rs.rand(50, 40) < 0.5)
        vals = dense[rows, cols]
        result = mf_train(rows, cols, vals, (50, 40), rank=3,
                          lrate=0.05, lambd=0.01, num_epochs=60,
                          tol=1e-9, batch_size=256, seed=0,
                          dtype=jnp.float64)
        assert result.rmse_history[-1] < 0.3 * result.rmse_history[0]

    def test_generalized_normalizes_regularization(self):
        rs = np.random.RandomState(1)
        rows = rs.randint(0, 20, 300)
        cols = rs.randint(0, 15, 300)
        vals = rs.rand(300)
        res = mf_train(rows, cols, vals, (20, 15), rank=2, num_epochs=3,
                       generalized=True, seed=0)
        assert np.isfinite(res.rmse_history).all()

    @pytest.mark.parametrize("optimizer", ["adagrad", "rmsprop", "adam"])
    def test_optimizers_run(self, optimizer):
        rs = np.random.RandomState(2)
        rows = rs.randint(0, 10, 100)
        cols = rs.randint(0, 8, 100)
        vals = rs.rand(100) * 5
        res = mf_train(rows, cols, vals, (10, 8), rank=2, num_epochs=2,
                       optimizer=optimizer, seed=0)
        assert np.isfinite(res.rmse_history).all()


class TestPMFModel:
    def test_end_to_end(self, prepared_data):
        model = ProbabilisticMF(prepared_data, seed=0)
        model.verbose = False
        model.num_epochs = 5
        model.rank = 4
        scores = model.evaluate()
        assert len(scores) == 4
        assert model.rmse_history
        assert len(model.iterations_time) == len(model.rmse_history)

    def test_scoring_uses_user_factors(self, prepared_data):
        model = ProbabilisticMF(prepared_data, seed=0)
        model.verbose = False
        model.num_epochs = 3
        model.rank = 4
        recs = model.recommendations
        p = np.asarray(model.user_embeddings)
        q = np.asarray(model.item_embeddings)
        holdout = prepared_data.test.holdout
        test_users = np.sort(holdout["userid"].unique())
        scores = p[test_users] @ q.T
        # spot check the top item of the first user (before seen-filter the
        # argmax may be a seen item; compare unfiltered path)
        model.filter_seen = False
        recs_nofilter = model.recommendations
        np.testing.assert_array_equal(recs_nofilter[:, 0],
                                      np.argmax(scores, axis=1))


class TestHooi:
    def make_tensor(self, seed=0, noise=0.0):
        rs = np.random.RandomState(seed)
        u = np.linalg.qr(rs.randn(20, 2))[0]
        v = np.linalg.qr(rs.randn(15, 3))[0]
        w = np.linalg.qr(rs.randn(4, 2))[0]
        g = rs.randn(2, 3, 2)
        tensor = np.einsum("abc,ia,jb,kc->ijk", g, u, v, w)
        if noise:
            tensor = tensor + noise * rs.randn(*tensor.shape)
        return tensor

    def test_exact_recovery(self):
        tensor = self.make_tensor()
        idx = np.array(list(np.ndindex(*tensor.shape)))
        val = tensor.ravel()
        res = hooi(idx, val, tensor.shape, (2, 3, 2), num_iters=50,
                   growth_tol=1e-12, seed=0, dtype=jnp.float64)
        recon = np.einsum("abc,ia,jb,kc->ijk", np.asarray(res.core),
                          np.asarray(res.u0), np.asarray(res.u1),
                          np.asarray(res.u2))
        np.testing.assert_allclose(recon, tensor, atol=1e-8)

    def test_factors_orthonormal(self):
        tensor = self.make_tensor(noise=0.05)
        idx = np.array(list(np.ndindex(*tensor.shape)))
        res = hooi(idx, tensor.ravel(), tensor.shape, (2, 3, 2),
                   num_iters=10, growth_tol=1e-8, seed=0,
                   dtype=jnp.float64)
        for f in (res.u0, res.u1, res.u2):
            f = np.asarray(f)
            np.testing.assert_allclose(f.T @ f, np.eye(f.shape[1]),
                                       atol=1e-8)

    def test_core_norm_captures_energy(self):
        tensor = self.make_tensor()
        idx = np.array(list(np.ndindex(*tensor.shape)))
        res = hooi(idx, tensor.ravel(), tensor.shape, (2, 3, 2),
                   num_iters=50, growth_tol=1e-12, seed=0,
                   dtype=jnp.float64)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(res.core)),
                                   np.linalg.norm(tensor), rtol=1e-8)

    def test_round_core_full_rank_is_exact(self):
        rs = np.random.RandomState(0)
        core = rs.randn(3, 4, 2)
        rotation, new_core = round_core(core, mode=1, rank=4)

        def unfold(c, mode):
            lead = [mode] + [m for m in range(c.ndim) if m != mode]
            return c.transpose(lead).reshape(c.shape[mode], -1, order="F")

        # at full rank the rotation is exact: core = rotation @ new_core
        np.testing.assert_allclose(unfold(core, 1),
                                   rotation @ unfold(new_core, 1),
                                   atol=1e-10)

    def test_round_core_reduces_shape(self):
        rs = np.random.RandomState(1)
        core = rs.randn(3, 4, 2)
        rotation, new_core = round_core(core, mode=1, rank=2)
        assert rotation.shape == (4, 2)
        assert new_core.shape == (3, 2, 2)
        # energy is preserved up to truncation
        assert np.linalg.norm(new_core) <= np.linalg.norm(core) + 1e-12


class TestFlattener:
    def setup_method(self):
        rs = np.random.RandomState(0)
        self.w = rs.randn(5, 3)  # (n_fb, r2)

    def test_default_slice_sums_levels(self):
        out = flatten_feedback_weights(self.w, slice(0, None))
        np.testing.assert_allclose(out, self.w.T.sum(axis=-1))

    def test_int_picks_level(self):
        out = flatten_feedback_weights(self.w, 2)
        np.testing.assert_allclose(out, self.w.T[:, 2])

    def test_str_applies_numpy_fn(self):
        out = flatten_feedback_weights(self.w, "mean")
        np.testing.assert_allclose(out, self.w.T.mean(axis=-1))

    def test_tuple(self):
        out = flatten_feedback_weights(self.w, (slice(1, 4), "sum"))
        np.testing.assert_allclose(out, self.w.T[:, 1:4].sum(axis=-1))

    def test_callable(self):
        out = flatten_feedback_weights(self.w, lambda wt: wt[:, -1])
        np.testing.assert_allclose(out, self.w.T[:, -1])


class TestCoffeeModel:
    def test_end_to_end(self, prepared_data):
        model = CoffeeModel(prepared_data)
        model.verbose = False
        model.mlrank = (5, 4, 2)
        model.num_iters = 5
        model.seed = 0
        scores = model.evaluate()
        assert len(scores) == 4
        holdout = prepared_data.test.holdout
        assert model.recommendations.shape == (
            holdout["userid"].nunique(), model.topk)

    def test_mlrank_reduction_rounds_core(self, prepared_data):
        model = CoffeeModel(prepared_data)
        model.verbose = False
        model.mlrank = (6, 5, 2)
        model.num_iters = 4
        model.seed = 0
        model.build()
        assert model.factors["core"].shape == (6, 5, 2)
        model.mlrank = (4, 5, 2)
        assert model._is_ready  # reduced without rebuild
        assert model.factors["core"].shape == (4, 5, 2)
        assert model.factors[prepared_data.fields.userid].shape[1] == 4
        model.mlrank = (8, 5, 2)  # beyond built rank
        assert not model._is_ready

    def test_predict_feedback_values_in_scale(self, prepared_data):
        model = CoffeeModel(prepared_data)
        model.verbose = False
        model.mlrank = (5, 4, 2)
        model.num_iters = 4
        model.seed = 0
        model.build()
        predicted = model.predict_feedback()
        observed = set(prepared_data.training["rating"].unique())
        assert set(np.unique(predicted)) <= observed


import pytest as _pytest


@_pytest.mark.parametrize("optimizer", ["adanorm", "gnprop", "gnpropz"])
def test_rowwise_norm_optimizers_learn(optimizer):
    """Reference gradient adjusters (optimize.py:102-120) reduce RMSE."""
    import numpy as np
    from polara_tpu.ops.factorize import mf_train
    rs = np.random.RandomState(0)
    n_u, n_i = 40, 30
    dense = (rs.rand(n_u, n_i) < 0.3) * rs.randint(1, 6, (n_u, n_i))
    rows, cols = np.nonzero(dense)
    vals = dense[rows, cols].astype(float)
    hist = []
    mf_train(rows, cols, vals, (n_u, n_i), 6, lrate=0.05, lambd=0.01,
             num_epochs=15, tol=0.0, batch_size=256, optimizer=optimizer,
             seed=0, iter_errors=hist)
    assert hist[-1] < hist[0]


def test_hooi_dense_path_matches_segment_path():
    import numpy as np
    import jax.numpy as jnp
    from polara_tpu.ops.hooi import hooi
    from polara_tpu.ops.rsvd import principal_angles_max_sin

    rs = np.random.RandomState(0)
    idx = np.unique(np.stack([rs.randint(0, 40, 2000),
                              rs.randint(0, 25, 2000),
                              rs.randint(0, 4, 2000)], 1), axis=0)
    val = np.ones(len(idx))
    shape, core_shape = (40, 25, 4), (6, 5, 2)
    seg = hooi(idx, val, shape, core_shape, num_iters=8, growth_tol=0.0,
               seed=0, dtype=jnp.float64)
    dense = hooi(idx, val, shape, core_shape, num_iters=8, growth_tol=0.0,
                 seed=0, dtype=jnp.float64, dense_budget_bytes=1 << 30)
    for a, b in [(seg.u0, dense.u0), (seg.u1, dense.u1), (seg.u2, dense.u2)]:
        assert principal_angles_max_sin(jnp.asarray(a),
                                        jnp.asarray(b)) < 1e-6
    np.testing.assert_allclose(np.asarray(seg.core), np.asarray(dense.core),
                               atol=1e-6)


def test_scaled_svd_dense_cache_tracks_scaling():
    """The cached densified operator must not leak across col_scaling
    changes (cache is keyed by the scaling signature)."""
    import numpy as np
    from polara_tpu.data import RecommenderData
    from polara_tpu.datasets import make_synthetic_interactions
    from polara_tpu.models import ScaledSVD

    events = make_synthetic_interactions(60, 40, 1200, seed=3)
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 1
    data.prepare()

    model = ScaledSVD(data)
    model.rank = 6
    model.verbose = False
    model.col_scaling = 0.4
    model.build()
    s_04 = np.asarray(model.factors["singular_values"]).copy()

    model.col_scaling = 1.0  # pure SVD scaling
    model.build()
    s_10 = np.asarray(model.factors["singular_values"]).copy()
    assert not np.allclose(s_04, s_10)

    model.col_scaling = 0.4  # back: must reproduce the first spectrum
    model.build()
    np.testing.assert_allclose(np.asarray(model.factors["singular_values"]),
                               s_04, rtol=1e-5)
    # only one dense block retained at a time
    dense_keys = [k for k in data._device_matrix_cache
                  if isinstance(k, tuple) and k and k[0] == "svd_dense"]
    assert len(dense_keys) == 1


def test_svd_method_krylov_matches_subspace():
    """`svd_method = "krylov"` is a drop-in solver switch.  Block-
    structured ratings give a separated top spectrum (random sparse
    fixtures are all degenerate noise bulk, where no solver pins
    vectors), so factors and recommendations must coincide tightly."""
    from polara_tpu.ops.rsvd import principal_angles_max_sin

    rs = np.random.RandomState(0)
    n_u, n_i, g = 80, 50, 4
    ug, ig = rs.randint(0, g, n_u), rs.randint(0, g, n_i)
    rows, cols = np.nonzero(rs.rand(n_u, n_i) < 0.6)
    vals = np.where(ug[rows] == ig[cols], 5, 1) + rs.randint(0, 2, len(rows))
    frame = pd.DataFrame({"userid": rows, "movieid": cols,
                          "rating": vals.astype(np.int64)})
    data = RecommenderData(frame, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 1
    data.prepare()

    def make(method):
        model = SVDModel(data)
        model.verbose = False
        model.rank = 4
        model.compute_dtype = jnp.float64
        model.svd_method = method
        model.svd_iters = 12        # krylov depth 6
        model.build()
        return model

    sub, kry = make("subspace"), make("krylov")
    itemid = data.fields.itemid
    np.testing.assert_allclose(
        np.asarray(sub.factors["singular_values"]),
        np.asarray(kry.factors["singular_values"]), rtol=1e-5)
    assert principal_angles_max_sin(sub.factors[itemid],
                                    kry.factors[itemid]) < 5e-3
    agree = (sub.recommendations == kry.recommendations).mean()
    assert agree >= 0.98
