"""Implicit-feedback factorization kernels: confidence-weighted ALS and BPR.

The reference delegates these models to the ``implicit`` C library
(``polara/recommender/external/implicit/ialswrapper.py:13-91``,
``bprwrapper.py:7-76``).  Here both train natively on device:

* **iALS** (Hu/Koren/Volinsky): each half-sweep solves a batched stack of
  k×k normal systems ``(G + Yᵀdiag(c-1)Y) x = Yᵀ(c·p)``.  The per-entity
  weighted grams come from one ``bik,bil->bkl`` contraction per user
  batch — pure MXU work — and the k×k solves are a vmapped Cholesky.
  The same solve doubles as warm-start folding-in (the reference loops
  ``recommend(recalculate_user=True)`` per user; here it is one batched
  call).
* **BPR** (Rendle et al.): vectorized minibatch SGD over sampled
  (user, pos, neg) triples; negatives drawn uniformly and masked against
  a dense seen-matrix lookup instead of per-sample rejection loops.
  Scatter-adds make concurrent duplicate-user updates accumulate
  (hogwild-equivalent, but deterministic under a fixed key).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from polara_tpu.ops.sparse import gather_padded_panels

WeightFn = Union[str, Callable, None]


def confidence(values: jax.Array, alpha: float = 1.0,
               weight: WeightFn = "log2",
               epsilon: float = 1.0) -> jax.Array:
    """Generic confidence transform ``alpha * w(r / eps)`` applied to the
    nonzero ratings (reference ``ialswrapper.py:46-50``); zero entries
    stay zero so the result is the ``C - 1`` margin over the unit
    baseline confidence."""
    scaled = values / epsilon
    if weight is None:
        transformed = scaled
    elif weight == "log2":
        transformed = jnp.log2(jnp.maximum(scaled, 1e-12) + 1.0)
    elif weight == "log":
        transformed = jnp.log(jnp.maximum(scaled, 1e-12) + 1.0)
    elif weight == "linear":
        transformed = scaled
    elif weight == "sqrt":
        transformed = jnp.sqrt(jnp.maximum(scaled, 0.0))
    elif callable(weight):
        transformed = weight(scaled)
    else:
        raise ValueError(f"Unknown confidence weight {weight!r}")
    return jnp.where(values > 0, alpha * transformed, 0.0)


class ImplicitFactors(NamedTuple):
    user: jax.Array
    item: jax.Array


def canonical_weight(weight: WeightFn) -> WeightFn:
    """Map ``np.sqrt``/``jnp.sqrt`` (the reference notebooks' tuned iALS
    confidence) onto the named ``"sqrt"`` weight so the transform can run
    under jit — ``np.sqrt`` on a tracer raises — and so serving bundles
    can persist it by name.  ONLY sqrt maps: it is identical to the
    callable on the positive domain, whereas the named ``"log2"``/
    ``"log"`` branches compute ``w(x + 1)`` and are NOT the same math as
    the ``np.log2``/``np.log`` callables (``w(x)``, the reference
    wrapper's default) — those keep their callable semantics."""
    if callable(weight) and getattr(weight, "__name__", None) == "sqrt":
        return "sqrt"
    return weight


def _solve_cm1_block(cm1_b: jax.Array, other: jax.Array,
                     gram: jax.Array) -> jax.Array:
    """Batched k×k normal-equation solve for one block of entities.

    ``cm1_b`` is the (batch, cols) confidence margin ``C - 1`` (zero where
    unobserved); peak intermediate is the (batch, cols, k) weighted panel.
    """
    pref = cm1_b > 0
    # rhs = Yᵀ (c ⊙ p) with c = cm1 + 1 on observed entries
    rhs = jnp.where(pref, cm1_b + 1.0, 0.0) @ other            # (b, k)
    weighted = cm1_b[:, :, None] * other[None, :, :]            # (b, n, k)
    a = gram[None] + jnp.einsum("bik,il->bkl", weighted, other)
    chol = jax.scipy.linalg.cho_factor(a)
    return jax.scipy.linalg.cho_solve(chol, rhs[..., None])[..., 0]


def _batch_starts(n_rows: int, batch_rows: int):
    """Clamped batch offsets covering [0, n_rows) without padding: the last
    batch backs up to end exactly at ``n_rows`` (rows solved twice get the
    identical answer — the fixed ``other`` side makes the solve per-row)."""
    batch_rows = min(batch_rows, n_rows)
    n_batches = -(-n_rows // batch_rows)
    starts = np.minimum(np.arange(n_batches) * batch_rows,
                        n_rows - batch_rows)
    return jnp.asarray(starts, jnp.int32), batch_rows, n_batches


@partial(jax.jit, static_argnames=("batch_rows",))
def ials_half_sweep(cm1: jax.Array, other: jax.Array, reg: float,
                    batch_rows: int = 64) -> jax.Array:
    """Solve for one side's factors given the other side.

    ``cm1`` is the dense (rows × cols) confidence margin ``C - 1`` (zero
    where unobserved); ``other`` the (cols × k) fixed factors.  Rows are
    batched through clamped dynamic slices — no padded copy of ``cm1`` is
    ever made, so the only HBM beyond the inputs is one (batch, cols, k)
    intermediate.
    """
    n_rows, n_cols = cm1.shape
    k = other.shape[1]
    gram = other.T @ other + reg * jnp.eye(k, dtype=other.dtype)
    starts, b, n_batches = _batch_starts(n_rows, batch_rows)

    def body(ib, out):
        start = starts[ib]
        zero = jnp.int32(0)
        cm1_b = jax.lax.dynamic_slice(cm1, (start, zero), (b, n_cols))
        x = _solve_cm1_block(cm1_b, other, gram)
        return jax.lax.dynamic_update_slice(out, x, (start, zero))

    out = jnp.zeros((n_rows, k), other.dtype)
    return jax.lax.fori_loop(0, n_batches, body, out)


def _auto_batch_rows(n_rows: int, n_other: int, rank: int,
                     budget_bytes: int = 2 << 30) -> int:
    """Largest batch whose (batch, n_other, rank) weighted panel plus the
    einsum temporary fit the budget — per-row independent solves make the
    result invariant to batching, so bigger batches only help: the sweep
    is dispatch/MXU-efficiency-bound at tiny batches (the fixed 64-row
    default cost ~19k sequential micro-steps per ML-10M epoch)."""
    per_row = max(1, n_other * rank * 4 * 2)
    b = budget_bytes // per_row
    b = max(8, min(1024, b, n_rows))
    return int(b) & ~7 or 8      # multiple of 8 for clean tiling


def ials_train(dense_ratings: jax.Array, rank: int, alpha: float = 1.0,
               weight: WeightFn = "log2", epsilon: float = 1.0,
               reg: float = 0.01, num_epochs: int = 15,
               seed: Optional[int] = 0,
               batch_rows: Optional[int] = None,
               dtype=jnp.float32) -> ImplicitFactors:
    """Alternating sweeps over users and items on the dense HBM-resident
    ratings block.

    HBM-lean: the confidence margin ``C - 1`` is recomputed per batch from
    the ratings block inside the sweeps (an elementwise transform costs
    nothing next to the MXU contractions), so neither ``C - 1`` nor its
    transposed copy is ever resident — at ML-10M geometry that is ~6 GB of
    savings, the difference between fitting a single v5e and OOMing.

    A custom *callable* weight cannot run inside the jitted sweeps
    (numpy ufuncs raise on tracers), so that path applies the confidence
    transform eagerly and trains on the materialized margin — the
    pre-optimization memory profile; named weights keep the lean path."""
    weight = canonical_weight(weight)
    n_users, n_items = dense_ratings.shape
    key = jax.random.key(0 if seed is None else seed)
    item_factors = (jax.random.normal(key, (n_items, rank), dtype)
                    * (1.0 / math.sqrt(rank)))
    user_factors = jnp.zeros((n_users, rank), dtype)

    if callable(weight):
        dense_ratings = confidence(dense_ratings.astype(dtype), alpha,
                                   weight, epsilon)
        alpha, epsilon, weight = 1.0, 1.0, "__margin__"

    batch_user = batch_rows or _auto_batch_rows(n_users, n_items, rank)
    batch_item = batch_rows or _auto_batch_rows(n_items, n_users, rank)
    user_factors, item_factors = _ials_epochs(
        dense_ratings, user_factors, item_factors, alpha, epsilon, reg,
        weight, num_epochs, batch_user, batch_item)
    return ImplicitFactors(user=user_factors, item=item_factors)


def _ials_sweep(dense, other, alpha, epsilon, reg, weight: WeightFn,
                batch_rows: int, axis: int) -> jax.Array:
    """One half-sweep solving factors for rows (``axis=0``) or columns
    (``axis=1``) of the raw ratings block, applying the confidence
    transform blockwise."""
    n_rows = dense.shape[axis]
    n_other = dense.shape[1 - axis]
    dtype = other.dtype
    k = other.shape[1]
    gram = other.T @ other + reg * jnp.eye(k, dtype=dtype)
    starts, b, n_batches = _batch_starts(n_rows, batch_rows)

    def body(ib, out):
        start = starts[ib]
        zero = jnp.int32(0)
        if axis == 0:
            blk = jax.lax.dynamic_slice(dense, (start, zero), (b, n_other))
        else:
            blk = jax.lax.dynamic_slice(dense, (zero, start),
                                        (n_other, b)).T
        if weight == "__margin__":
            # ``dense`` already carries the confidence margin (callable
            # weights applied eagerly in ials_train)
            cm1_b = blk.astype(dtype)
        else:
            cm1_b = confidence(blk.astype(dtype), alpha, weight, epsilon)
        x = _solve_cm1_block(cm1_b, other, gram)
        return jax.lax.dynamic_update_slice(out, x, (start, zero))

    out = jnp.zeros((n_rows, k), dtype)
    return jax.lax.fori_loop(0, n_batches, body, out)


class EllSide(NamedTuple):
    """Tile-aligned event stream for one half-sweep of the streaming
    iALS (see :func:`ials_train_events`).

    Every entity's event list is padded to a multiple of ``tile`` and
    laid out contiguously, so each tile of ``tile`` events belongs to
    exactly one entity — per-tile normal-equation contributions become
    batched MXU matmuls, and the per-entity reduction is a tiny
    ``segment_sum`` over tile owners instead of a scatter over events.
    Entities batch in natural order (events are sorted by entity) under
    an EVENT budget — variable entity counts per batch, equalized tile
    spans — so Zipf-skewed sides (the popular item head) never blow the
    window past HBM the way fixed entity counts did (a 4096-item head
    batch at Netflix scale owned ~58M events, a ~23 GB gather).  Each
    batch covers a clamped static window of ``tb`` tiles; tiles inside
    the window that belong to another batch map to a dump segment, and
    each batch writes back only its own ``n_ents`` rows, so overlapping
    or zero-entity (padding) batches are no-ops.
    """
    minor: jax.Array        # (e_pad,) int32 — other-side ids, 0 on padding
    w: jax.Array            # (e_pad,) float — C-1 margins, 0 on padding
    starts: jax.Array       # (n_batches,) int32 — tile offset per batch
    ent_starts: jax.Array   # (n_batches,) int32 — first entity per batch
    n_ents: jax.Array       # (n_batches,) int32 — entities owned per batch
    owner_local: jax.Array  # (n_batches, tb) int32 in [0, batch_entities]
    n_entities: int
    batch_entities: int     # static per-batch segment width (>= max n_ents)
    tile: int


class EventPanels(NamedTuple):
    """Device-staged tile panels of one event side at natural (unpadded)
    size — the expensive half of :func:`stage_events_side`, computed
    once and shared across geometry-forcing restages (the forcings only
    append zero tiles / batches, never re-gather)."""
    minor: jax.Array        # (nat_tiles*tile,) int32
    w: jax.Array            # (nat_tiles*tile,) weights
    owner: jax.Array        # (nat_tiles,) int32 tile -> entity
    tiles_np: np.ndarray    # host per-entity tile counts
    n_major: int
    tile: int


def stage_events_panels(maj: jax.Array, minor: jax.Array, cm1: jax.Array,
                        n_major: int, tile: int = 128) -> EventPanels:
    """Device staging of one side's tile-aligned panels (``maj`` must be
    sorted ascending): per-entity tile counts, tile-owner table, and
    gather-built (minor, weight) panels."""
    nnz = maj.shape[0]
    maj = maj.astype(jnp.int32)
    ones = jnp.ones((nnz,), jnp.int32)
    counts = jax.ops.segment_sum(ones, maj, num_segments=n_major,
                                 indices_are_sorted=True)
    pc = -(-counts // tile) * tile                 # tile-padded counts
    base = jnp.cumsum(pc) - pc                     # dest base per entity
    ev_start = jnp.cumsum(counts) - counts

    tiles_np = np.asarray(pc // tile, dtype=np.int64)       # host fetch
    nat_tiles = int(tiles_np.sum())
    owner = jnp.repeat(jnp.arange(n_major, dtype=jnp.int32),
                       jnp.asarray(tiles_np, jnp.int32),
                       total_repeat_length=nat_tiles)
    minor_p, w_p = gather_padded_panels(owner, base, counts, ev_start,
                                        minor, cm1, nat_tiles, tile)
    return EventPanels(minor=minor_p, w=w_p, owner=owner,
                       tiles_np=tiles_np, n_major=n_major, tile=tile)


def stage_events_side(maj: jax.Array, minor: jax.Array, cm1: jax.Array,
                      n_major: int, tile: int = 128,
                      batch_entities: int = 4096,
                      max_window_events: int = 4_000_000,
                      pad_events_to: int = 0,
                      window_tiles: int = 1,
                      pad_batches_to: int = 0,
                      min_batch_entities: int = 0,
                      panels: Optional[EventPanels] = None) -> EllSide:
    """Stage one :class:`EllSide` (gather on device, plan on host).

    ``maj`` must be sorted ascending (sort on device first for the
    column side).  One host fetch of the per-entity tile counts drives
    the greedy batch plan: consecutive entities pack into a batch until
    its tile span would exceed ``max_window_events`` (or the entity
    count exceeds ``batch_entities``), so per-batch gather windows are
    equalized regardless of popularity skew and peak live memory per
    half-sweep step is ~``max_window_events × k`` floats.

    ``pad_events_to`` / ``window_tiles`` / ``pad_batches_to`` /
    ``min_batch_entities`` force minimum static shapes so several
    independently staged sides share one geometry — the mesh path
    (:func:`polara_tpu.parallel.distributed.distributed_ials_events`)
    stages one side per device band and shard_map needs them uniform.
    All four only inflate: pad-tail tiles carry zero-weight events,
    padding batches own zero entities (masked write → no-op), a widened
    window only pulls tiles the owner mask dumps, and a widened segment
    count only solves extra rows the ``n_ents`` write mask drops.

    ``panels`` short-circuits the expensive device staging: restages
    that only force geometry (the mesh fixpoint runs up to three per
    band) pass the first stage's panels and pay only the host plan
    plus zero-tile padding.
    """
    if panels is None:
        panels = stage_events_panels(maj, minor, cm1, n_major, tile)
    tiles_np = panels.tiles_np
    cum = np.concatenate(([0], np.cumsum(tiles_np)))
    nat_tiles = int(cum[-1])
    if nat_tiles == 0 and not pad_events_to:
        raise ValueError("empty event stream")
    e_pad = max(nat_tiles * tile,
                -(-int(pad_events_to) // tile) * tile)
    n_tiles = e_pad // tile

    minor_p, w_p, owner = panels.minor, panels.w, panels.owner
    if n_tiles > nat_tiles:
        # trailing pad tiles carry zero-weight events and belong to the
        # clamped last entity id (keeps owner ids sorted) — pure append,
        # no re-gather
        pad_t = n_tiles - nat_tiles
        owner = jnp.concatenate([
            owner, jnp.full((pad_t,), n_major - 1, jnp.int32)])
        minor_p = jnp.concatenate([
            minor_p, jnp.zeros((pad_t * tile,), minor_p.dtype)])
        w_p = jnp.concatenate([
            w_p, jnp.zeros((pad_t * tile,), w_p.dtype)])

    # greedy equalized batch plan (host, O(n_batches) searchsorted steps)
    budget_tiles = max(1, -(-int(max_window_events) // tile))
    be_cap = max(1, min(batch_entities, n_major))
    b_start, b_ents = [], []
    s = 0
    while s < n_major:
        e = int(np.searchsorted(cum, cum[s] + budget_tiles,
                                side="right")) - 1
        e = min(max(e, s + 1), s + be_cap, n_major)
        b_start.append(s)
        b_ents.append(e - s)
        s = e
    be_seg = min(max(max(b_ents), int(min_batch_entities), 1), n_major)
    ent0 = np.minimum(np.asarray(b_start), n_major - be_seg)
    # coverage from the clamped start: clamped-in earlier entities are
    # fully inside the window (span below includes them), so the batch
    # recomputes them correctly — overlap between batches is idempotent
    n_ents = np.minimum(np.asarray(b_start) + np.asarray(b_ents),
                        n_major) - ent0
    span = cum[ent0 + n_ents] - cum[ent0]
    tb = max(int(span.max()), 1, int(window_tiles))
    if tb * tile > e_pad:
        raise ValueError(
            f"window of {tb} tiles exceeds the padded event stream "
            f"({e_pad} events); raise pad_events_to to at least "
            f"{tb * tile}")
    if pad_batches_to > len(ent0):                 # zero-entity no-ops
        extra = pad_batches_to - len(ent0)
        ent0 = np.concatenate([ent0, np.zeros(extra, ent0.dtype)])
        n_ents = np.concatenate([n_ents, np.zeros(extra, n_ents.dtype)])
    raw_start = np.minimum(cum[ent0], n_tiles - tb)

    starts = jnp.asarray(raw_start, jnp.int32)
    ent_starts_d = jnp.asarray(ent0, jnp.int32)
    n_ents_d = jnp.asarray(n_ents, jnp.int32)
    idx = starts[:, None] + jnp.arange(tb, dtype=jnp.int32)[None, :]
    ol = owner[idx] - ent_starts_d[:, None]
    ol = jnp.where((ol >= 0) & (ol < n_ents_d[:, None]), ol,
                   be_seg).astype(jnp.int32)
    return EllSide(minor=minor_p, w=w_p, starts=starts,
                   ent_starts=ent_starts_d, n_ents=n_ents_d,
                   owner_local=ol, n_entities=n_major,
                   batch_entities=be_seg, tile=tile)


@partial(jax.jit, static_argnames=("n_entities", "batch_entities",
                                   "tile"))
def _ell_half_sweep(minor_p, w_p, starts, ent_starts, n_ents, owner_local,
                    other, reg, n_entities: int, batch_entities: int,
                    tile: int):
    """One streaming half-sweep: solve every entity's k×k normal system
    from its tile-aligned events.

    Per batch window: gather the other side's factor rows for the
    window's events, form per-tile Gram/rhs contributions as batched
    matmuls (MXU — this is where the nnz·k² flops live), segment-sum the
    (tile-count × k × k) contributions by local owner, and run one
    vmapped Cholesky solve.  Peak live memory is one (tb·tile, k) gather
    window — bounded by the staging event budget, independent of nnz.
    Each batch writes back only its own ``n_ents`` rows, so geometry
    padding (zero-entity batches, widened segment counts) is a no-op.
    """
    k = other.shape[1]
    tb = owner_local.shape[1]
    gram = other.T @ other + reg * jnp.eye(k, dtype=other.dtype)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (batch_entities, 1), 0)

    def body(out, batch):
        st, ent0, ne, ol = batch
        ev0 = st * tile
        msl = jax.lax.dynamic_slice(minor_p, (ev0,), (tb * tile,))
        wsl = jax.lax.dynamic_slice(w_p, (ev0,), (tb * tile,))
        y = other[msl].reshape(tb, tile, k)
        yw = y * wsl.reshape(tb, tile)[..., None]
        gt = jnp.einsum("btk,btl->bkl", yw, y)
        rw = (wsl + (wsl > 0)).reshape(tb, tile)
        rt = jnp.einsum("btk,bt->bk", y, rw)
        g = jax.ops.segment_sum(gt, ol,
                                num_segments=batch_entities + 1)
        r = jax.ops.segment_sum(rt, ol,
                                num_segments=batch_entities + 1)
        a = gram[None] + g[:batch_entities]
        chol = jax.scipy.linalg.cho_factor(a)
        x = jax.scipy.linalg.cho_solve(chol,
                                       r[:batch_entities][..., None])[..., 0]
        zero = jnp.zeros((), ent0.dtype)
        cur = jax.lax.dynamic_slice(out, (ent0, zero),
                                    (batch_entities, k))
        x = jnp.where(rowid < ne, x, cur)
        return jax.lax.dynamic_update_slice(out, x, (ent0, zero)), None

    out = jnp.zeros((n_entities, k), other.dtype)
    out, _ = jax.lax.scan(body, out,
                          (starts, ent_starts, n_ents, owner_local))
    return out


def ials_train_events(rows: np.ndarray, cols: np.ndarray,
                      vals: np.ndarray, shape, rank: int,
                      alpha: float = 1.0, weight: WeightFn = "log2",
                      epsilon: float = 1.0, reg: float = 0.01,
                      num_epochs: int = 15, seed: Optional[int] = 0,
                      tile: int = 128, batch_entities: int = 4096,
                      max_window_events: int = 4_000_000,
                      dtype=jnp.float32) -> ImplicitFactors:
    """Streaming iALS over the raw event stream — the beyond-HBM tier.

    :func:`ials_train` recomputes the dense ``C - 1`` margin per batch,
    which requires the dense ratings block in HBM; at Netflix scale
    (~32 GiB f32) that is impossible on one chip.  Here each half-sweep
    assembles every entity's normal equations from its own events only
    (the classic implicit-feedback identity ``YᵀC_uY = YᵀY + Σ_e
    (c_e−1) y_e y_eᵀ``, reference ``ialswrapper.py:46-60``), organized
    TPU-first: tile-aligned event panels make the nnz·k² Gram work
    batched MXU matmuls rather than scatters (see :class:`EllSide`).
    Same init, sweep order and fixed epoch count as :func:`ials_train`
    — parity is float-reduction-order level on shared workloads.

    Callable confidence weights are applied eagerly on the event values
    (they cannot run under jit).
    """
    weight = canonical_weight(weight)
    n_users, n_items = (int(s) for s in shape)
    nnz = len(vals)
    if nnz == 0:
        raise ValueError("empty matrix")

    rows_d = jnp.asarray(rows, jnp.int32)
    cols_d = jnp.asarray(cols, jnp.int32)
    vals_d = jnp.asarray(vals, dtype)
    # staging is eager, so callable weights work here directly (the
    # dense path must special-case them out of its jitted sweeps)
    cm1 = confidence(vals_d, alpha, weight, epsilon)

    if not bool(jnp.all(jnp.diff(rows_d) >= 0)):
        order = jnp.argsort(rows_d, stable=True)
        rows_d, cols_d, cm1 = rows_d[order], cols_d[order], cm1[order]
    user_side = stage_events_side(rows_d, cols_d, cm1, n_users,
                                  tile=tile,
                                  batch_entities=batch_entities,
                                  max_window_events=max_window_events)
    corder = jnp.argsort(cols_d, stable=True)
    item_side = stage_events_side(cols_d[corder], rows_d[corder],
                                  cm1[corder], n_items, tile=tile,
                                  batch_entities=min(batch_entities,
                                                     n_items),
                                  max_window_events=max_window_events)

    key = jax.random.key(0 if seed is None else seed)
    item_factors = (jax.random.normal(key, (n_items, rank), dtype)
                    * (1.0 / math.sqrt(rank)))
    user_factors = jnp.zeros((n_users, rank), dtype)
    reg_d = jnp.asarray(reg, dtype)

    def half(side: EllSide, other):
        return _ell_half_sweep(side.minor, side.w, side.starts,
                               side.ent_starts, side.n_ents,
                               side.owner_local, other,
                               reg_d, n_entities=side.n_entities,
                               batch_entities=side.batch_entities,
                               tile=side.tile)

    for _ in range(num_epochs):
        user_factors = half(user_side, item_factors)
        item_factors = half(item_side, user_factors)
    return ImplicitFactors(user=user_factors, item=item_factors)


@partial(jax.jit, static_argnames=("weight", "num_epochs", "batch_user",
                                   "batch_item"))
def _ials_epochs(dense, user_factors, item_factors, alpha, epsilon, reg,
                 weight: WeightFn, num_epochs: int, batch_user: int,
                 batch_item: int):
    """All alternating sweeps in one device program (a host dispatch per
    half-sweep costs more than the sweep itself on TPU)."""

    def epoch(_, carry):
        user_factors, item_factors = carry
        user_factors = _ials_sweep(dense, item_factors, alpha, epsilon,
                                   reg, weight, batch_user, axis=0)
        item_factors = _ials_sweep(dense, user_factors, alpha, epsilon,
                                   reg, weight, batch_item, axis=1)
        return user_factors, item_factors

    return jax.lax.fori_loop(0, num_epochs, epoch,
                             (user_factors, item_factors))


def ials_fold_in(profiles: jax.Array, item_factors: jax.Array,
                 alpha: float = 1.0, weight: WeightFn = "log2",
                 epsilon: float = 1.0, reg: float = 0.01,
                 batch_rows: Optional[int] = None) -> jax.Array:
    """Warm-start user vectors from raw test profiles in one batched
    solve (replaces the reference's per-user ``recalculate_user`` loop)."""
    cm1 = confidence(profiles.astype(item_factors.dtype), alpha, weight,
                     epsilon)
    if batch_rows is None:
        batch_rows = _auto_batch_rows(cm1.shape[0], cm1.shape[1],
                                      item_factors.shape[1])
    return ials_half_sweep(cm1, item_factors, reg, batch_rows)


@partial(jax.jit, static_argnames=("n_steps", "batch_size", "lr", "reg"))
def _bpr_epoch(user_factors, item_factors, seen, rows, cols, key,
               n_steps: int, batch_size: int, lr: float, reg: float):
    nnz = rows.shape[0]
    n_items = item_factors.shape[0]

    def step(carry, key_step):
        x, y = carry
        kp, kn = jax.random.split(key_step)
        idx = jax.random.randint(kp, (batch_size,), 0, nnz)
        u, i = rows[idx], cols[idx]
        j = jax.random.randint(kn, (batch_size,), 0, n_items)
        ok = ~seen[u, j]

        xu, yi, yj = x[u], y[i], y[j]
        margin = jnp.sum(xu * (yi - yj), axis=1)
        g = jax.nn.sigmoid(-margin)          # d(-log sig)/d(-margin)
        g = jnp.where(ok, g, 0.0)[:, None]
        okf = ok[:, None].astype(x.dtype)

        x = x.at[u].add(lr * (g * (yi - yj) - reg * okf * xu))
        y = y.at[i].add(lr * (g * xu - reg * okf * yi))
        y = y.at[j].add(lr * (-g * xu - reg * okf * yj))
        auc = jnp.sum(jnp.where(ok, margin > 0, False)) \
            / jnp.maximum(jnp.sum(ok), 1)
        return (x, y), auc

    keys = jax.random.split(key, n_steps)
    (user_factors, item_factors), aucs = jax.lax.scan(
        step, (user_factors, item_factors), keys)
    return user_factors, item_factors, jnp.mean(aucs)


def bpr_train(rows: np.ndarray, cols: np.ndarray, shape, rank: int,
              learning_rate: float = 0.01, reg: float = 0.01,
              num_epochs: int = 100, batch_size: int = 1024,
              seed: Optional[int] = 0, dtype=jnp.float32,
              verbose: bool = False,
              epoch_stats: Optional[list] = None) -> ImplicitFactors:
    """Bayesian personalized ranking on sampled triples."""
    n_users, n_items = shape
    rows_d = jnp.asarray(rows, jnp.int32)
    cols_d = jnp.asarray(cols, jnp.int32)
    seen = jnp.zeros(shape, bool).at[rows_d, cols_d].set(True)

    key = jax.random.key(0 if seed is None else seed)
    key, ku, ki = jax.random.split(key, 3)
    scale = 1.0 / math.sqrt(rank)
    user_factors = jax.random.normal(ku, (n_users, rank), dtype) * scale
    item_factors = jax.random.normal(ki, (n_items, rank), dtype) * scale

    n_steps = max(1, -(-len(rows) // batch_size))
    pending_aucs = [] if epoch_stats is not None else None
    for epoch in range(num_epochs):
        key, key_epoch = jax.random.split(key)
        user_factors, item_factors, auc = _bpr_epoch(
            user_factors, item_factors, seen, rows_d, cols_d, key_epoch,
            n_steps=n_steps, batch_size=batch_size, lr=learning_rate,
            reg=reg)
        if verbose:
            print(f"BPR epoch {epoch + 1}: batch AUC {float(auc):.4f}")
        if pending_aucs is not None:
            pending_aucs.append(auc)   # device scalar: no per-epoch sync
    if pending_aucs:
        # one stacked transfer for the whole history — a per-epoch
        # float() costs a full tunnel RTT each (CLAUDE.md sync discipline)
        epoch_stats.extend(
            np.asarray(jnp.stack(pending_aucs)).astype(float).tolist())
    return ImplicitFactors(user=user_factors, item=item_factors)
