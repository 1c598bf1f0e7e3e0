"""Native implicit-feedback models (iALS, BPR) + external adapter gating."""
import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp

from polara_tpu.data import RecommenderData
from polara_tpu.datasets import make_synthetic_interactions
from polara_tpu.models import ImplicitALS, ImplicitBPR, RandomModel
from polara_tpu.ops.implicit import (confidence, ials_half_sweep,
                                     ials_train, bpr_train)


def make_data(seed=0, holdout=1, warm=False):
    events = make_synthetic_interactions(n_users=60, n_items=40,
                                         n_events=1200, seed=seed)
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=seed, verbose=False)
    data.holdout_size = holdout
    if warm:
        data.test_ratio = 0.2
        data.warm_start = True
    data.prepare()
    return data


def test_confidence_transform():
    vals = jnp.asarray([0.0, 1.0, 2.0, 4.0])
    out = np.asarray(confidence(vals, alpha=2.0, weight="log2",
                                epsilon=1.0))
    assert out[0] == 0.0  # unobserved stays zero
    np.testing.assert_allclose(out[1:], 2.0 * np.log2([2.0, 3.0, 5.0]),
                               rtol=1e-5)
    lin = np.asarray(confidence(vals, alpha=3.0, weight="linear",
                                epsilon=2.0))
    np.testing.assert_allclose(lin, [0.0, 1.5, 3.0, 6.0])


def test_ials_half_sweep_matches_reference_solve():
    """Batched device solve agrees with the per-user numpy normal
    equations of Hu et al."""
    rs = np.random.RandomState(0)
    n_users, n_items, k = 7, 11, 3
    dense = (rs.rand(n_users, n_items) < 0.4) * rs.randint(1, 6,
                                                           (n_users,
                                                            n_items))
    y = rs.randn(n_items, k)
    reg = 0.1
    cm1 = np.asarray(confidence(jnp.asarray(dense, jnp.float64),
                                alpha=2.0, weight="linear"))
    x = np.asarray(ials_half_sweep(jnp.asarray(cm1),
                                   jnp.asarray(y), reg, batch_rows=3))
    for u in range(n_users):
        cu = cm1[u]
        p = (cu > 0).astype(float)
        a = y.T @ y + y.T @ np.diag(cu) @ y + reg * np.eye(k)
        b = y.T @ ((cu + 1) * p)
        np.testing.assert_allclose(x[u], np.linalg.solve(a, b),
                                   rtol=1e-4, atol=1e-6)


def test_ials_training_reduces_loss():
    rs = np.random.RandomState(1)
    dense = (rs.rand(30, 20) < 0.35) * rs.randint(1, 6, (30, 20))
    dense = jnp.asarray(dense, jnp.float32)
    few = ials_train(dense, rank=5, num_epochs=1, seed=0)
    many = ials_train(dense, rank=5, num_epochs=10, seed=0)

    def wls_loss(f):
        cm1 = np.asarray(confidence(dense))
        pref = (np.asarray(dense) > 0).astype(np.float32)
        pred = np.asarray(f.user) @ np.asarray(f.item).T
        return np.sum((cm1 + 1.0) * (pref - pred) ** 2)

    assert wls_loss(many) < wls_loss(few)


class TestIalsTrainEvents:
    """Streaming (tile-aligned event) iALS == dense iALS — same init,
    same sweeps, parity up to float reduction order."""

    def _coo_and_dense(self, m=57, n=33, seed=2, density=0.18):
        import scipy.sparse as sp
        rs = np.random.RandomState(seed)
        csr = sp.random(m, n, density=density, random_state=rs,
                        data_rvs=lambda s: rs.randint(1, 6, s)
                        .astype(float))
        coo = csr.tocoo()
        return coo, jnp.asarray(csr.toarray(), jnp.float64)

    @pytest.mark.parametrize("tile,batch_entities", [(4, 16), (8, 57),
                                                     (128, 4096)])
    def test_matches_dense_ials(self, tile, batch_entities):
        from polara_tpu.ops.implicit import ials_train_events
        coo, dense = self._coo_and_dense()
        ref = ials_train(dense, rank=5, num_epochs=4, seed=0,
                         dtype=jnp.float64)
        got = ials_train_events(coo.row, coo.col, coo.data, coo.shape,
                                rank=5, num_epochs=4, seed=0, tile=tile,
                                batch_entities=batch_entities,
                                dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(got.user),
                                   np.asarray(ref.user), atol=1e-9)
        np.testing.assert_allclose(np.asarray(got.item),
                                   np.asarray(ref.item), atol=1e-9)

    def test_panels_reuse_matches_fresh_stage(self):
        """A forced-geometry restage from precomputed EventPanels must
        equal a fresh full stage field-for-field (the mesh fixpoint
        leans on this to skip the expensive device staging)."""
        from polara_tpu.ops.implicit import (confidence, canonical_weight,
                                             stage_events_panels,
                                             stage_events_side)
        coo, _ = self._coo_and_dense(m=41, n=19, seed=7)
        order = np.argsort(coo.row, kind="stable")
        maj = jnp.asarray(coo.row[order], jnp.int32)
        minor = jnp.asarray(coo.col[order], jnp.int32)
        w = confidence(jnp.asarray(coo.data[order], jnp.float64), 40.0,
                       canonical_weight(None), 0.0)
        kw = dict(tile=4, batch_entities=5, max_window_events=24,
                  pad_events_to=400, window_tiles=9, pad_batches_to=13,
                  min_batch_entities=7)
        fresh = stage_events_side(maj, minor, w, 41, **kw)
        pan = stage_events_panels(maj, minor, w, 41, tile=4)
        reused = stage_events_side(maj, minor, w, 41, panels=pan, **kw)
        for field in fresh._fields:
            a, b = getattr(fresh, field), getattr(reused, field)
            if isinstance(a, (int, float)):
                assert a == b, field
            else:
                np.testing.assert_array_equal(np.asarray(a),
                                              np.asarray(b), err_msg=field)

    def test_empty_rows_and_unsorted_events(self):
        """Entities with zero events solve to zero vectors; unsorted
        event order must not change the result."""
        from polara_tpu.ops.implicit import ials_train_events
        rows = np.array([5, 1, 5, 3, 1, 5], np.int32)
        cols = np.array([0, 2, 1, 2, 0, 3], np.int32)
        vals = np.array([3.0, 4.0, 5.0, 1.0, 2.0, 4.0])
        got = ials_train_events(rows, cols, vals, (8, 5), rank=3,
                                num_epochs=3, seed=1, tile=4,
                                batch_entities=3, dtype=jnp.float64)
        dense = np.zeros((8, 5))
        dense[rows, cols] = vals
        ref = ials_train(jnp.asarray(dense, jnp.float64), rank=3,
                         num_epochs=3, seed=1, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(got.user),
                                   np.asarray(ref.user), atol=1e-9)
        # user 0 has no events -> zero vector
        assert np.abs(np.asarray(got.user)[0]).max() == 0.0

    def test_callable_weight(self):
        from polara_tpu.ops.implicit import ials_train_events
        coo, dense = self._coo_and_dense(seed=5)
        ref = ials_train(dense, rank=4, weight=np.log2, num_epochs=3,
                         seed=0, dtype=jnp.float64)
        got = ials_train_events(coo.row, coo.col, coo.data, coo.shape,
                                rank=4, weight=np.log2, num_epochs=3,
                                seed=0, tile=8, batch_entities=16,
                                dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(got.item),
                                   np.asarray(ref.item), atol=1e-9)


def test_ials_model_routes_past_budget_to_streaming():
    """With a budget too small for the dense ratings block, ImplicitALS
    must train through the streaming event sweeps and reproduce the
    dense-path recommendations."""
    from polara_tpu import config as defaults

    data = make_data(seed=4)
    base = ImplicitALS(data)
    base.verbose = False
    base.compute_dtype = jnp.float64
    base.rank = 5
    recs_dense = np.asarray(base.recommendations)

    old = defaults.get_default("hbm_score_budget_gb")
    defaults.set_default("hbm_score_budget_gb", 1e-7)
    try:
        tiny = ImplicitALS(data)
        tiny.verbose = False
        tiny.compute_dtype = jnp.float64
        tiny.rank = 5
        tiny.build()
        recs_stream = np.asarray(tiny.recommendations)
    finally:
        defaults.set_default("hbm_score_budget_gb", old)
    assert (recs_dense == recs_stream).mean() > 0.98


def test_bpr_training_improves_auc():
    events = make_synthetic_interactions(n_users=50, n_items=30,
                                         n_events=900, seed=2)
    rows = events["userid"].values
    cols = events["movieid"].values
    stats = []
    bpr_train(rows, cols, (50, 30), rank=6, num_epochs=15,
              batch_size=256, seed=0, epoch_stats=stats)
    assert stats[-1] > stats[0]
    assert stats[-1] > 0.6  # learns ranking signal


def test_ials_model_end_to_end():
    data = make_data()
    model = ImplicitALS(data)
    model.rank = 8
    model.num_epochs = 8
    model.verbose = False
    recs = model.recommendations
    n_test = data.test.holdout["userid"].nunique()
    assert recs.shape == (n_test, model.topk)
    scores = model.evaluate("relevance")
    rnd = RandomModel(data, seed=5)
    rnd.verbose = False
    assert scores.hr >= rnd.evaluate("relevance").hr


def test_bpr_model_end_to_end():
    data = make_data(seed=3)
    model = ImplicitBPR(data)
    model.rank = 8
    model.num_epochs = 20
    model.batch_size = 256
    model.verbose = False
    recs = model.recommendations
    assert recs.shape[1] == model.topk
    assert np.isfinite(model.evaluate("ranking", simple_rates=True).mrr)


def test_ials_warm_start_folding_in():
    data = make_data(seed=4, warm=True)
    model = ImplicitALS(data)
    model.rank = 6
    model.num_epochs = 5
    model.verbose = False
    recs = model.recommendations
    n_test = data.test.holdout["userid"].nunique()
    assert recs.shape == (n_test, model.topk)
    # seen items are always filtered in warm start
    model.filter_seen = False
    with pytest.raises(ValueError):
        model.get_recommendations()


def test_bpr_warm_start_folding_in():
    data = make_data(seed=5, warm=True)
    model = ImplicitBPR(data)
    model.rank = 6
    model.num_epochs = 10
    model.batch_size = 256
    model.verbose = False
    recs = model.recommendations
    assert recs.shape[1] == model.topk


def test_external_wrappers_importable_and_gated():
    from polara_tpu.models import external

    assert hasattr(external, "LightFMWrapper")
    assert hasattr(external, "TuriFactorizationRecommender")
    data = make_data(seed=6)
    try:
        import lightfm  # noqa: F401
        has_lightfm = True
    except ImportError:
        has_lightfm = False
    if not has_lightfm:
        model = external.LightFMWrapper(data)
        with pytest.raises(ImportError, match="lightfm"):
            model.build()


def test_mml_parse_and_remap(tmp_path):
    """Round-trip the MyMediaLite text-model format without the binary."""
    from polara_tpu.models.external.mymedialite import (parse_mml_model,
                                                        remap_factors)
    nu, ni, nf = 3, 2, 2
    lines = ["2.99", "BPRMF", f"{nu} {nf}"]
    u = np.arange(nu * nf, dtype=float).reshape(nu, nf)
    for i in range(nu):
        for f in range(nf):
            lines.append(f"{i} {f} {u[i, f]}")
    lines.append(f"{ni} {nf}")
    v = (np.arange(ni * nf, dtype=float) + 100).reshape(ni, nf)
    for i in range(ni):
        for f in range(nf):
            lines.append(f"{i} {f} {v[i, f]}")
    path = tmp_path / "model.txt"
    path.write_text("\n".join(lines) + "\n")

    users_f, items_f, biases, nf_parsed = parse_mml_model(str(path))
    assert nf_parsed == nf
    assert biases is None
    assert len(users_f) == nu * nf and len(items_f) == ni * nf

    mapping = pd.DataFrame({0: ["a", "b", "c"], 1: [2, 0, 1]})
    remapped = remap_factors(mapping, users_f, 3, nf)
    np.testing.assert_allclose(remapped[2], u[0])
    np.testing.assert_allclose(remapped[0], u[1])


def test_canonical_weight_maps_only_equivalent_callables():
    # np.log2/np.log must KEEP callable semantics: the named "log2"
    # branch computes log2(x+1), the reference's callable default is
    # log2(x) (ialswrapper.py:39-42) — conflating them silently trains
    # a different confidence model (round-3 review finding)
    from polara_tpu.ops.implicit import canonical_weight
    assert canonical_weight(np.sqrt) == "sqrt"
    assert canonical_weight(jnp.sqrt) == "sqrt"
    assert canonical_weight(np.log2) is np.log2
    assert canonical_weight(np.log) is np.log
    assert canonical_weight("log2") == "log2"

    vals = jnp.asarray([1.0, 2.0, 5.0])
    named = confidence(vals, weight="log2")
    called = confidence(vals, weight=np.log2)
    assert not np.allclose(np.asarray(named), np.asarray(called))


def test_ials_train_callable_weight_matches_eager_margin():
    # callable weights route through the eager-margin path; the result
    # must equal alternating half-sweeps on the precomputed margin
    rs = np.random.RandomState(2)
    dense = jnp.asarray((rs.rand(24, 16) < 0.4) * rs.randint(1, 6, (24, 16)),
                        jnp.float32)
    trained = ials_train(dense, rank=4, weight=np.log2, num_epochs=3,
                         seed=0, batch_rows=8)

    cm1 = confidence(dense, weight=np.log2)
    key = jax.random.key(0)
    item = jax.random.normal(key, (16, 4), jnp.float32) / np.sqrt(4)
    for _ in range(3):
        user = ials_half_sweep(cm1, item, 0.01, batch_rows=8)
        item = ials_half_sweep(cm1.T, user, 0.01, batch_rows=8)
    np.testing.assert_allclose(np.asarray(trained.item), np.asarray(item),
                               rtol=1e-4, atol=1e-6)
