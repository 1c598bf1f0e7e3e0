"""Fused Pallas scoring backend: kernel parity + driver integration.

On CPU the kernel runs in interpret mode (Mosaic lowering needs real
TPU); the driver integration test forces ``pallas_scoring=True`` which
maps to interpret off-TPU — numerics must match the XLA path exactly.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from polara_tpu import config as defaults
from polara_tpu.data import RecommenderData
from polara_tpu.datasets import make_synthetic_interactions
from polara_tpu.models import SVDModel, ProbabilisticMF
from polara_tpu.ops.pallas import (CARRY_WIDTH, fused_score_topk,
                                   pack_seen_bits)
from polara_tpu.ops.topk import mask_and_topk

INTERP = jax.default_backend() != "tpu"


def _random_case(seed, n_users=16, n_items=700, rank=12, nnz=300):
    rs = np.random.RandomState(seed)
    proj = jnp.asarray(rs.randn(n_users, rank), jnp.float32)
    items = jnp.asarray(rs.randn(n_items, rank), jnp.float32)
    rows = rs.randint(0, n_users, nnz).astype(np.int32)
    cols = rs.randint(0, n_items, nnz).astype(np.int32)
    return proj, items, rows, cols


@pytest.mark.parametrize("filter_seen", [True, False])
@pytest.mark.parametrize("tile_skip", [False, True])
def test_kernel_parity_with_xla(filter_seen, tile_skip):
    proj, items, rows, cols = _random_case(0)
    n_items = items.shape[0]
    # tile_n=128 so the tile-skip guard sees many tiles (5+) and actually
    # exercises both skipped and merged grid steps; the striped bitmask
    # must be packed with the same tile_n the kernel runs with
    bits = jnp.asarray(pack_seen_bits(rows, cols, proj.shape[0], n_items,
                                      tile_n=128))
    got = np.asarray(fused_score_topk(proj, items, bits, 10,
                                      filter_seen=filter_seen,
                                      tile_n=128, tile_skip=tile_skip,
                                      interpret=INTERP))
    ref = np.asarray(mask_and_topk(
        proj @ items.T, jnp.asarray(rows), jnp.asarray(cols),
        jnp.ones(len(rows), bool), 10, filter_seen=filter_seen,
        n_valid_cols=n_items))
    np.testing.assert_array_equal(got, ref)


def test_clear_seen_bits_device_inverts_pack():
    """Clearing a subset of packed (row, col) bits == packing without
    that subset (zero-wire holdout studies depend on this)."""
    from polara_tpu.ops.pallas import clear_seen_bits_device

    rs = np.random.RandomState(4)
    n_rows, n_cols, nnz = 30, 9000, 1200
    pairs = rs.choice(n_rows * n_cols, nnz, replace=False)
    rows = (pairs // n_cols).astype(np.int32)
    cols = (pairs % n_cols).astype(np.int32)
    full = pack_seen_bits(rows, cols, n_rows, n_cols)
    drop = rs.choice(nnz, 100, replace=False)
    keep = np.setdiff1d(np.arange(nnz), drop)
    want = pack_seen_bits(rows[keep], cols[keep], n_rows, n_cols)
    got = clear_seen_bits_device(jnp.asarray(full),
                                 jnp.asarray(rows[drop]),
                                 jnp.asarray(cols[drop]))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_kernel_tile_skip_with_duplicate_scores():
    """Equal scores across tiles must keep the lowest-index tie rule
    under tile_skip (a tying later tile is a skippable no-op)."""
    n_users, n_items = 8, 512
    proj = jnp.ones((n_users, 1), jnp.float32)
    base = np.zeros((n_items, 1), np.float32)
    base[:, 0] = np.tile([3.0, 1.0, 2.0, 2.0], n_items // 4)
    items = jnp.asarray(base)
    bits = jnp.zeros((n_users, n_items // 32), jnp.uint32)
    got = np.asarray(fused_score_topk(proj, items, bits, 7,
                                      filter_seen=False, tile_n=128,
                                      tile_skip=True, interpret=INTERP))
    ref = np.asarray(mask_and_topk(
        proj @ items.T, jnp.zeros(0, jnp.int32), jnp.zeros(0, jnp.int32),
        jnp.zeros(0, bool), 7, filter_seen=False, n_valid_cols=n_items))
    np.testing.assert_array_equal(got, ref)


def test_kernel_pad_beyond_catalog():
    proj, items, rows, cols = _random_case(1, n_items=35, nnz=0)
    bits = jnp.zeros((proj.shape[0], 2), jnp.uint32)
    got = np.asarray(fused_score_topk(proj, items, bits, 40,
                                      filter_seen=False, n_valid_cols=35,
                                      interpret=INTERP))
    assert (got[:, 35:] == -1).all()
    order = np.argsort(-np.asarray(proj @ items.T), axis=1)
    np.testing.assert_array_equal(got[:, :35], order)


def test_kernel_user_blocking():
    proj, items, rows, cols = _random_case(2, n_users=40, nnz=500)
    bits = jnp.asarray(pack_seen_bits(rows, cols, 40, items.shape[0]))
    got = np.asarray(fused_score_topk(proj, items, bits, 5,
                                      block_users=16, interpret=INTERP))
    ref = np.asarray(mask_and_topk(
        proj @ items.T, jnp.asarray(rows), jnp.asarray(cols),
        jnp.ones(len(rows), bool), 5, filter_seen=True,
        n_valid_cols=items.shape[0]))
    np.testing.assert_array_equal(got, ref)


def test_kernel_k_guard():
    proj, items, _, _ = _random_case(3)
    bits = jnp.zeros((proj.shape[0], 32), jnp.uint32)
    with pytest.raises(ValueError, match="k <="):
        fused_score_topk(proj, items, bits, CARRY_WIDTH + 1,
                         interpret=INTERP)


def test_pack_seen_bits_roundtrip():
    rs = np.random.RandomState(4)
    rows = rs.randint(0, 10, 200)
    cols = rs.randint(0, 9000, 200)
    words = pack_seen_bits(rows, cols, 10, 9000, tile_n=4096)
    w = 4096 // 32
    for r, c in zip(rows, cols):
        t, o = c // 4096, c % 4096
        assert (words[r, t * w + o % w] >> (o // w)) & 1


@pytest.fixture
def small_data():
    events = make_synthetic_interactions(n_users=50, n_items=30,
                                         n_events=800, seed=0)
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = False  # known-user scenario (PMF has no folding-in)
    data.test_ratio = 0
    data.holdout_size = 2
    data.prepare()
    return data


@pytest.mark.parametrize("model_cls", [SVDModel, ProbabilisticMF])
def test_driver_fused_matches_xla(small_data, model_cls):
    model = model_cls(small_data)
    model.verbose = False
    if hasattr(model, "rank"):
        model.rank = 6
    if isinstance(model, ProbabilisticMF):
        model.num_epochs = 3
    xla_recs = model.recommendations.copy()
    saved = defaults.get_default("pallas_scoring")
    try:
        defaults.set_default("pallas_scoring", True)
        model._recommendations = None
        fused_recs = model.recommendations
    finally:
        defaults.set_default("pallas_scoring", saved)
    np.testing.assert_array_equal(fused_recs, xla_recs)


def test_driver_fused_matches_xla_coffee(small_data):
    from polara_tpu.models import CoffeeModel
    model = CoffeeModel(small_data)
    model.mlrank = (6, 5, 2)
    model.verbose = False
    xla_recs = model.recommendations.copy()
    saved = defaults.get_default("pallas_scoring")
    try:
        defaults.set_default("pallas_scoring", True)
        model._recommendations = None
        model._test_plan = None
        fused_recs = model.recommendations
    finally:
        defaults.set_default("pallas_scoring", saved)
    np.testing.assert_array_equal(fused_recs, xla_recs)


@pytest.mark.parametrize("seed,n_users,n_items,rank,k,nnz", [
    (10, 8, 100, 4, 10, 50),         # tiny catalog, single tile
    (11, 33, 5000, 16, 20, 4000),    # odd user count, two tiles
    (12, 130, 9000, 8, 1, 20_000),   # k=1, crosses block_users
    (13, 16, 4096, 8, 128, 1000),    # k == CARRY_WIDTH, exact tile fit
    (14, 24, 300, 5, 7, 24 * 250),   # dense seen sets (~83% seen)
])
def test_kernel_parity_shapes(seed, n_users, n_items, rank, k, nnz):
    rs = np.random.RandomState(seed)
    proj = jnp.asarray(rs.randn(n_users, rank), jnp.float32)
    items = jnp.asarray(rs.randn(n_items, rank), jnp.float32)
    pairs = np.unique(np.stack(
        [rs.randint(0, n_users, nnz), rs.randint(0, n_items, nnz)], 1),
        axis=0)
    rows, cols = pairs[:, 0].astype(np.int32), pairs[:, 1].astype(np.int32)
    bits = jnp.asarray(pack_seen_bits(rows, cols, n_users, n_items))
    got = np.asarray(fused_score_topk(proj, items, bits, k,
                                      interpret=INTERP))
    ref = np.asarray(mask_and_topk(
        proj @ items.T, jnp.asarray(rows), jnp.asarray(cols),
        jnp.ones(len(rows), bool), k, filter_seen=True,
        n_valid_cols=n_items))
    np.testing.assert_array_equal(got, ref)


def test_kernel_select_tie_rule():
    """Massive score ties (rank-1 integer factors): the select must
    resolve every tie to the lowest item index, like the XLA path."""
    rs = np.random.RandomState(7)
    n_users, n_items, k = 12, 1000, 16
    proj = jnp.asarray(rs.randint(0, 3, (n_users, 1)), jnp.float32)
    items = jnp.asarray(rs.randint(0, 4, (n_items, 1)), jnp.float32)
    rows = rs.randint(0, n_users, 600).astype(np.int32)
    cols = rs.randint(0, n_items, 600).astype(np.int32)
    bits = jnp.asarray(pack_seen_bits(rows, cols, n_users, n_items,
                                      tile_n=256))
    got = np.asarray(fused_score_topk(proj, items, bits, k, tile_n=256,
                                      interpret=INTERP))
    ref = np.asarray(mask_and_topk(
        proj @ items.T, jnp.asarray(rows), jnp.asarray(cols),
        jnp.ones(len(rows), bool), k, filter_seen=True,
        n_valid_cols=n_items))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("tile_n", [128, 4096])
def test_pack_seen_bits_device_parity(tile_n):
    """Device scatter-add pack == host pack, bit for bit (unique pairs)."""
    from polara_tpu.ops.pallas import pack_seen_bits_device
    rs = np.random.RandomState(5)
    n_rows, n_cols = 37, 900
    flat = rs.choice(n_rows * n_cols, size=1500, replace=False)
    rows = (flat // n_cols).astype(np.int32)
    cols = (flat % n_cols).astype(np.int32)
    host = pack_seen_bits(rows, cols, n_rows, n_cols, tile_n=tile_n)
    dev = np.asarray(pack_seen_bits_device(
        jnp.asarray(rows), jnp.asarray(cols), n_rows, n_cols,
        tile_n=tile_n))
    np.testing.assert_array_equal(dev, host.astype(dev.dtype))




# --------------------------------------------------------------------------
# popularity-ordered item layout (run_scoring_fused item_order)
# --------------------------------------------------------------------------

def _plan_and_params(seed=11, n_users=30, n_items=500, rank=8):
    """A ChunkedTestData plan + SVD-shaped params over random factors,
    with Zipf-ish skewed item usage so the popularity permutation is
    non-trivial."""
    from polara_tpu.ops.scoring import ChunkedTestData
    rs = np.random.RandomState(seed)
    n_ev = 1200
    rows = np.sort(rs.randint(0, n_users, n_ev)).astype(np.int64)
    # skewed item margins: low ids much more frequent
    cols = np.minimum((rs.pareto(1.2, n_ev) * 8).astype(np.int64),
                      n_items - 1)
    vals = rs.randint(1, 6, n_ev).astype(np.float64)
    plan = ChunkedTestData.build(rows, cols, vals, n_users=n_users,
                                 n_items=n_items)
    v = jnp.asarray(rs.randn(n_items, rank), jnp.float32)
    params = {"item_factors": v, "item_panel": v,
              "test_users": jnp.arange(n_users, dtype=jnp.int32)}
    return plan, params


@pytest.mark.parametrize("filter_seen", [True, False])
def test_item_order_popularity_matches_unordered(filter_seen):
    """The popularity-ordered fused route returns the SAME top-k sets
    (and, with continuous scores, the same ranked lists) as the plain
    catalog-order route — the permutation is a layout change only."""
    from polara_tpu.ops.scoring import run_scoring_fused

    plan, params = _plan_and_params()
    kw = dict(topk=10, filter_seen=filter_seen,
              n_valid_cols=plan.n_items, interpret=INTERP)
    base = run_scoring_fused(plan, SVDModel.proj_chunk, params, **kw)
    ordered = run_scoring_fused(plan, SVDModel.proj_chunk, params,
                                item_order="popularity", **kw)
    np.testing.assert_array_equal(ordered, base)


def test_item_order_tie_resolves_to_popular():
    """Documented deviation: equal-score ties resolve toward the more
    popular item under item_order='popularity' (catalog order resolves
    to the lower item id)."""
    from polara_tpu.ops.scoring import ChunkedTestData, run_scoring_fused

    n_users, n_items = 4, 300
    # every item has the IDENTICAL panel row -> all scores tie
    panel = jnp.ones((n_items, 4), jnp.float32)
    # item 250 is by far the most popular in the test profiles
    rows = np.repeat(np.arange(n_users), 3).astype(np.int64)
    cols = np.tile([250, 250, 250], n_users).astype(np.int64)
    plan = ChunkedTestData.build(rows, cols,
                                 np.ones(len(rows)), n_users=n_users,
                                 n_items=n_items)
    params = {"item_panel": panel,
              "test_users": jnp.arange(n_users, dtype=jnp.int32)}

    def proj_fn(params, chunk):
        return jnp.ones((chunk.users.shape[0], 4), jnp.float32)

    kw = dict(topk=3, filter_seen=False, n_valid_cols=n_items,
              interpret=INTERP)
    base = run_scoring_fused(plan, proj_fn, params, **kw)
    ordered = run_scoring_fused(plan, proj_fn, params,
                                item_order="popularity", **kw)
    np.testing.assert_array_equal(base[0], [0, 1, 2])       # lowest ids
    assert ordered[0][0] == 250                             # popular first


def test_pop_order_identity_without_counts():
    """Plans built without item counts fall back to the identity
    ordering (and the fused route stays correct)."""
    from polara_tpu.ops.scoring import run_scoring_fused

    plan, params = _plan_and_params(seed=13)
    plan.item_counts = None
    perm, inv = plan.pop_order(plan.n_items)
    np.testing.assert_array_equal(perm, np.arange(plan.n_items))
    base = run_scoring_fused(plan, SVDModel.proj_chunk, params, topk=7,
                             n_valid_cols=plan.n_items, interpret=INTERP)
    ordered = run_scoring_fused(plan, SVDModel.proj_chunk, params, topk=7,
                                n_valid_cols=plan.n_items, interpret=INTERP,
                                item_order="popularity")
    np.testing.assert_array_equal(ordered, base)
