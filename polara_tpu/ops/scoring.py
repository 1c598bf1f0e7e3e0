"""Chunked test-user scoring driver.

Replaces the reference's thread-pool-over-user-slices machinery
(``polara/recommender/models.py:359-405``): instead of Python threads
filling a shared numpy buffer, test users are cut into statically shaped
chunks; each chunk runs one jitted score→downvote→top-k pass on device, and
chunks stream sequentially (a single chunk in the common case).  Chunk
geometry is uniform so every chunk reuses one compiled executable.

Multi-device: the user axis is embarrassingly parallel, so sharding the
chunk rows over the mesh ``users`` axis (see ``polara_tpu.parallel``) scales
scoring without collectives.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from polara_tpu import config as defaults
from polara_tpu.ops.topk import mask_and_topk
from polara_tpu.runtime.memory import plan_user_chunks


class TestChunk(NamedTuple):
    """Statically shaped slice of the test data handed to a model scorer.

    ``rows`` are chunk-relative user rows; ``users`` are absolute test-user
    row ids (into the rebased 0..n_test-1 space); invalid entries are
    masked.  Models that fold in user profiles use (rows, cols, vals);
    factor-lookup models use ``users``.
    """
    start: jax.Array        # scalar int32: first absolute user row
    users: jax.Array        # (chunk_users,) absolute user row ids
    user_valid: jax.Array   # (chunk_users,) bool
    rows: jax.Array         # (width,) chunk-relative user rows of events
    cols: jax.Array         # (width,) item ids of events
    vals: jax.Array         # (width,) feedback values
    valid: jax.Array        # (width,) bool


@dataclasses.dataclass
class ChunkedTestData:
    """Host-side plan: the sorted test COO cut into uniform chunks."""
    chunks: List[TestChunk]
    chunk_users: int
    n_users: int
    n_items: int
    # per-item event counts over the test profiles (host, for the fused
    # backend's popularity-ordered item layout); None = unknown
    item_counts: Optional[np.ndarray] = None

    @classmethod
    def build(cls, user_rows: np.ndarray, item_cols: np.ndarray,
              values: np.ndarray, n_users: int, n_items: int,
              chunk_users: Optional[int] = None,
              scores_multiplier: int = 1,
              budget_gb: Optional[float] = None,
              n_shards: int = 1) -> "ChunkedTestData":
        """``user_rows`` must be sorted ascending (data model guarantees).

        ``user_rows`` are *rebased* test rows 0..n_users-1 — the caller maps
        raw test user ids through the test-user list first (reference does
        the same rebasing in ``models.py:249-253``).

        ``n_shards``: mesh users-axis size — the planner budgets for a
        row-sharded score block (n_shards× fewer, larger chunks).
        """
        if chunk_users is None:
            bounds = plan_user_chunks(n_users, n_items,
                                      scores_multiplier=scores_multiplier,
                                      budget_gb=budget_gb,
                                      n_shards=n_shards)
            chunk_users = bounds[0][1] - bounds[0][0]
        n_chunks = -(-n_users // chunk_users)

        # uniform event-buffer width across chunks -> one compiled shape
        split_pts = [np.searchsorted(user_rows, c * chunk_users)
                     for c in range(n_chunks + 1)]
        width = max(1, max(split_pts[c + 1] - split_pts[c]
                           for c in range(n_chunks)))

        chunks = []
        for c in range(n_chunks):
            lo, hi = split_pts[c], split_pts[c + 1]
            start = c * chunk_users
            stop = min(start + chunk_users, n_users)
            n_ev = hi - lo
            rows = np.zeros(width, dtype=np.int32)
            cols = np.zeros(width, dtype=np.int32)
            vals = np.zeros(width, dtype=np.float32)
            valid = np.zeros(width, dtype=bool)
            rows[:n_ev] = user_rows[lo:hi] - start
            cols[:n_ev] = item_cols[lo:hi]
            vals[:n_ev] = values[lo:hi]
            valid[:n_ev] = True

            users = np.minimum(start + np.arange(chunk_users), n_users - 1)
            user_valid = (start + np.arange(chunk_users)) < stop
            chunks.append(TestChunk(
                start=jnp.int32(start),
                users=jnp.asarray(users, jnp.int32),
                user_valid=jnp.asarray(user_valid),
                rows=jnp.asarray(rows),
                cols=jnp.asarray(cols),
                vals=jnp.asarray(vals),
                valid=jnp.asarray(valid)))
        return cls(chunks=chunks, chunk_users=chunk_users,
                   n_users=n_users, n_items=n_items,
                   item_counts=np.bincount(item_cols,
                                           minlength=n_items
                                           ).astype(np.int64))

    def pop_order(self, n_valid: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """Descending-popularity permutation over the first ``n_valid``
        items, cached per plan: ``perm[j]`` is the original id of the
        j-th most-interacted item (stable — count ties keep ascending
        id), ``inv`` the original→position inverse.  Popularity is
        measured over the plan's own test profiles — a layout heuristic
        for the fused kernel's tile-skip guard, not a semantic input.
        Plans built without counts order by plain id (identity)."""
        cache = getattr(self, "_pop_order_cache", None)
        if cache is None:
            cache = self._pop_order_cache = {}
        entry = cache.get(n_valid)
        if entry is None:
            counts = self.item_counts
            if counts is None:
                counts = np.zeros(n_valid, np.int64)
            counts = counts[:n_valid]
            if len(counts) < n_valid:
                counts = np.pad(counts, (0, n_valid - len(counts)))
            perm = np.argsort(-counts, kind="stable").astype(np.int32)
            inv = np.zeros(n_valid, np.int32)
            inv[perm] = np.arange(n_valid, dtype=np.int32)
            entry = cache[n_valid] = (perm, inv)
        return entry

    def seen_bits(self, chunk_idx: int, n_items: int,
                  tile_n: int = 4096,
                  col_map: Optional[np.ndarray] = None,
                  map_token=None) -> jax.Array:
        """Packed seen-item bitmask for a chunk (cached — the test split
        is fixed for a plan's lifetime, so packing happens once even
        across model rebuilds).  ``tile_n`` must match the kernel's item
        tile (the striped word layout is tile-relative).  ``col_map``
        remaps item ids before packing (the fused backend's popularity-
        ordered layout); ``map_token`` must deterministically identify
        the map for caching (e.g. ``("pop", n_valid)``)."""
        cache = getattr(self, "_seen_bits_cache", None)
        if cache is None:
            cache = self._seen_bits_cache = {}
        key = (chunk_idx, n_items, tile_n, map_token)
        bits = cache.get(key)
        if bits is None:
            from polara_tpu.ops.pallas import pack_seen_bits
            chunk = self.chunks[chunk_idx]
            valid = np.asarray(chunk.valid)
            cols = np.asarray(chunk.cols)[valid]
            if col_map is not None:
                cols = col_map[cols]
            bits = jnp.asarray(pack_seen_bits(
                np.asarray(chunk.rows)[valid], cols,
                self.chunk_users, n_items, tile_n=tile_n))
            cache[key] = bits
        return bits

    def profile_matrix(self, chunk: TestChunk,
                       n_items: Optional[int] = None,
                       binary: bool = False,
                       dtype=jnp.float32) -> jax.Array:
        """Dense (chunk_users × n_items) interaction profile of a chunk."""
        n_items = n_items or self.n_items
        out = jnp.zeros((self.chunk_users, n_items), dtype=dtype)
        vals = jnp.where(chunk.valid,
                         jnp.sign(chunk.vals) if binary else chunk.vals,
                         0.0).astype(dtype)
        return out.at[chunk.rows, chunk.cols].add(vals)


# A scorer is a pure function (params, chunk) -> (chunk_users, n_items)
# scores.  Params travel as explicit pytree arguments so the compiled step
# is reused across model rebuilds (factors change value, not shape).
ScoreFn = Callable[[dict, TestChunk], jax.Array]

_step_cache: dict = {}


def compiled_step(score_fn: ScoreFn, topk: int, filter_seen: bool,
                  n_valid_cols: Optional[int], mesh=None):
    """Jitted score→downvote→top-k step, memoized by function identity.

    With ``mesh`` set, the dense score block is sharding-constrained to
    rows-over-``users`` — GSPMD partitions the score matmul and the top-k
    across the mesh (the SPMD replacement for the reference's thread pool
    over user slices, ``models.py:374-405``)."""
    key = (score_fn, topk, filter_seen, n_valid_cols, mesh)
    step = _step_cache.get(key)
    if step is None:
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            row_sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))
        @jax.jit
        def step(params, chunk: TestChunk) -> jax.Array:
            scores = score_fn(params, chunk)
            if mesh is not None:
                scores = jax.lax.with_sharding_constraint(scores,
                                                          row_sharding)
            return mask_and_topk(scores, chunk.rows, chunk.cols,
                                 chunk.valid, topk,
                                 filter_seen=filter_seen,
                                 n_valid_cols=n_valid_cols)
        _step_cache[key] = step
    return step


def run_scoring(data: ChunkedTestData, score_fn: ScoreFn, params: dict,
                topk: int, filter_seen: bool = True,
                n_valid_cols: Optional[int] = None, mesh=None,
                device: bool = False):
    """Score every chunk, mask seen items, take top-k; returns an int32
    array of shape (n_users, topk) — on host by default, or HBM-resident
    with ``device=True`` (consumers like the fused metric pass read the
    recommendations straight on device, skipping a download+reupload)."""
    step = compiled_step(score_fn, topk, filter_seen, n_valid_cols, mesh)
    parts = []
    for c, chunk in enumerate(data.chunks):
        recs = step(params, chunk)
        start = c * data.chunk_users
        stop = min(start + data.chunk_users, data.n_users)
        part = recs[: stop - start]
        parts.append(part if device else np.asarray(part))
    if device:
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
    return np.concatenate(parts, axis=0)


def run_scores_only(data: ChunkedTestData, score_fn: ScoreFn,
                    params: dict) -> np.ndarray:
    """Raw dense scores for all test users (no masking/top-k) — used by
    single-user inspection paths."""
    fn = jax.jit(score_fn)
    parts = []
    for c, chunk in enumerate(data.chunks):
        scores = fn(params, chunk)
        start = c * data.chunk_users
        stop = min(start + data.chunk_users, data.n_users)
        parts.append(np.asarray(scores)[: stop - start])
    return np.concatenate(parts, axis=0)


# --------------------------------------------------------------------------
# Fused Pallas backend
# --------------------------------------------------------------------------
# Factor models score as ``proj @ panelᵀ``; when a model exposes that
# decomposition (``proj_chunk`` + a ``"item_panel"`` param), the streaming
# Pallas kernel (polara_tpu.ops.pallas) replaces the XLA score->mask->top-k
# step on TPU: the dense score block never leaves VMEM.

def run_scoring_fused(data: ChunkedTestData, proj_fn: ScoreFn, params: dict,
                      topk: int, filter_seen: bool = True,
                      n_valid_cols: Optional[int] = None,
                      interpret: bool = False, device: bool = False,
                      mesh=None, item_order: Optional[str] = None):
    """Like :func:`run_scoring` but through the fused Pallas kernel.

    ``proj_fn(params, chunk) -> (chunk_users, r)`` produces the user-side
    panel; ``params["item_panel"]`` is the (n_items, r) item-side panel.

    ``item_order="popularity"`` lays the item panel out in descending
    interaction-count order and arms the kernel's tile-skip merge guard:
    the top-k carry warms up inside the first (popular, high-scoring)
    tiles, so most tail-tile merges reduce to one comparison — measured
    1.5-1.8x on the VPU-select-bound scoring phase at ML-10M geometry
    (``benchmarks/tile_skip_ab.py``; the guard without the layout is
    ~1.0x, the layout is what makes it fire).  Returned indices are
    mapped back to original item ids; the top-k SET is unchanged.
    Deviation (documented): equal-score ties resolve toward the more
    popular item instead of the lower item id.

    With ``mesh`` set, the kernel runs per shard under ``shard_map``.
    Proj rows and seen-bit rows always shard over the first mesh axis
    (users are embarrassingly parallel); when the mesh has a second axis
    of size > 1, the item panel AND the seen-bit words shard over it too
    — each device streams only its item slice through VMEM, takes a
    local fused top-k, and the per-shard candidate panels merge with one
    (k × n_model)-float all-gather per user row (the two-stage
    distributed top-k of ``sharded_score_topk_2d``, brought to the fused
    kernel).  At Netflix-scale catalogs this removes the last replicated
    panel (seen bits: users_shard × n_items/32 per device).
    """
    from polara_tpu.ops.pallas import fused_score_topk
    from polara_tpu.ops.topk import PAD_CONST

    panel = params["item_panel"]
    n_items = panel.shape[0]
    n_valid = n_valid_cols if n_valid_cols is not None else n_items
    ordered = item_order == "popularity" and n_valid > 1
    col_map = map_token = None
    lookup = None
    if ordered:
        perm, inv = data.pop_order(n_valid)
        col_map, map_token = inv, ("pop", n_valid)
        perm_full = np.concatenate(
            [perm, np.arange(n_valid, n_items, dtype=np.int32)])
        panel = jnp.take(panel, jnp.asarray(perm_full), axis=0)
        lookup = jnp.asarray(perm_full)
    proj_jit = compiled_proj(proj_fn)
    n_model = 1
    if mesh is not None:
        n_dev = mesh.shape[mesh.axis_names[0]]
        if len(mesh.axis_names) > 1:
            n_model = mesh.shape[mesh.axis_names[1]]
    if n_model > 1:
        per_shard = -(-n_items // n_model)
        tile2 = 4096 if per_shard >= 4096 else -(-per_shard // 128) * 128
        shard_items = -(-per_shard // tile2) * tile2
        total_pad = shard_items * n_model
        panel = jnp.pad(panel, ((0, total_pad - n_items), (0, 0)))
        invalid_row = jnp.asarray(_invalid_col_bits(n_valid, total_pad,
                                                    tile2))
        step = _fused_mesh_step_2d(mesh, topk, shard_items, tile2,
                                   interpret, tile_skip=ordered)
    elif mesh is not None:
        step = _fused_mesh_step(mesh, topk, filter_seen, n_valid,
                                interpret, tile_skip=ordered)
    parts = []
    for c, chunk in enumerate(data.chunks):
        proj = proj_jit(params, chunk)
        if n_model > 1:
            if filter_seen:
                seen_bits = data.seen_bits(c, total_pad, tile_n=tile2,
                                           col_map=col_map,
                                           map_token=map_token)
                seen_bits = seen_bits | invalid_row[None, :]
            else:
                seen_bits = jnp.broadcast_to(
                    invalid_row[None, :],
                    (proj.shape[0], invalid_row.shape[0]))
        else:
            seen_bits = data.seen_bits(c, n_items, col_map=col_map,
                                       map_token=map_token)
        if mesh is None:
            recs = fused_score_topk(proj, panel, seen_bits, topk,
                                    filter_seen=filter_seen,
                                    n_valid_cols=n_valid,
                                    interpret=interpret,
                                    tile_skip=ordered)
        else:
            pad = (-proj.shape[0]) % n_dev
            if pad:
                proj = jnp.pad(proj, ((0, pad), (0, 0)))
                seen_bits = jnp.pad(seen_bits, ((0, pad), (0, 0)))
            recs = step(proj, panel, seen_bits)
        if ordered:
            recs = jnp.where(recs == PAD_CONST, PAD_CONST,
                             lookup[jnp.maximum(recs, 0)])
        start = c * data.chunk_users
        stop = min(start + data.chunk_users, data.n_users)
        part = recs[: stop - start]
        parts.append(part if device else np.asarray(part))
    if device:
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
    return np.concatenate(parts, axis=0)


def _invalid_col_bits(n_valid: int, n_cols_pad: int,
                      tile_n: int) -> np.ndarray:
    """One striped-layout word row with bits set for every column in
    ``[n_valid, n_cols_pad)`` — ORed into the seen mask so per-shard
    validity needs no per-device static argument under shard_map (the
    SPMD trace is shared across shards)."""
    w = tile_n // 32
    # ceil like pack_seen_bits — a floor would under-allocate (and the
    # bitwise_or.at below would index out of bounds) for any padded
    # width that is not an exact tile multiple
    words = np.zeros(max(1, -(-n_cols_pad // tile_n)) * w, np.uint32)
    cols = np.arange(n_valid, n_cols_pad)
    off = cols % tile_n
    np.bitwise_or.at(words, (cols // tile_n) * w + off % w,
                     np.uint32(1) << (off // w).astype(np.uint32))
    return words


def _fused_mesh_step(mesh, topk: int, filter_seen: bool, n_valid: int,
                     interpret: bool, tile_skip: bool = False):
    """shard_map'd fused kernel over the mesh users axis, memoized like
    :func:`compiled_step` (one executable per configuration)."""
    key = ("fused_mesh", mesh, topk, filter_seen, n_valid, interpret,
           tile_skip)
    step = _step_cache.get(key)
    if step is None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from polara_tpu.ops.pallas import fused_score_topk

        users_axis = mesh.axis_names[0]

        def local_step(proj, panel, seen_bits):
            return fused_score_topk(proj, panel, seen_bits, topk,
                                    filter_seen=filter_seen,
                                    n_valid_cols=n_valid,
                                    interpret=interpret,
                                    tile_skip=tile_skip)

        step = jax.jit(shard_map(
            local_step, mesh=mesh,
            in_specs=(P(users_axis, None), P(), P(users_axis, None)),
            out_specs=P(users_axis, None), check_vma=False))
        _step_cache[key] = step
    return step


def _fused_mesh_step_2d(mesh, topk: int, shard_items: int, tile_n: int,
                        interpret: bool, tile_skip: bool = False):
    """Fused kernel over a 2-D (users × model) mesh: the item panel and
    the seen-bit words shard over the model axis; per-shard fused top-k
    candidates merge by score through one all-gather (two-stage
    distributed top-k).  Invalid/padded columns arrive pre-masked in the
    seen bits (see ``_invalid_col_bits``), so the kernel always runs
    ``filter_seen=True`` with ``n_valid_cols == shard_items`` — one SPMD
    trace serves every shard.  Tie rule is preserved end-to-end: within
    a shard the kernel picks the lowest index; across shards the gather
    orders candidates by ascending shard (= ascending global index) and
    ``lax.top_k`` keeps the first occurrence of equal values.  Under the
    popularity-ordered layout (``tile_skip=True``) positions ARE
    popularity ranks, so the same first-occurrence rule resolves ties
    toward the more popular item instead.
    """
    key = ("fused_mesh_2d", mesh, topk, shard_items, tile_n, interpret,
           tile_skip)
    step = _step_cache.get(key)
    if step is None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from polara_tpu.ops.pallas import fused_score_topk
        from polara_tpu.ops.topk import PAD_CONST

        users_axis, model_axis = mesh.axis_names[0], mesh.axis_names[1]

        def local_step(proj, panel, seen_bits):
            vals, idx = fused_score_topk(
                proj, panel, seen_bits, topk, filter_seen=True,
                tile_n=tile_n, n_valid_cols=shard_items,
                interpret=interpret, return_values=True,
                tile_skip=tile_skip)
            col_base = jax.lax.axis_index(model_axis) * shard_items
            idx = jnp.where(idx == PAD_CONST, PAD_CONST, idx + col_base)
            vals = jax.lax.all_gather(vals, model_axis, axis=1, tiled=True)
            idx = jax.lax.all_gather(idx, model_axis, axis=1, tiled=True)
            _, pos = jax.lax.top_k(vals, topk)
            return jnp.take_along_axis(idx, pos, axis=1).astype(jnp.int32)

        step = jax.jit(shard_map(
            local_step, mesh=mesh,
            in_specs=(P(users_axis, None), P(model_axis, None),
                      P(users_axis, model_axis)),
            out_specs=P(users_axis, None), check_vma=False))
        _step_cache[key] = step
    return step


def compiled_proj(proj_fn: ScoreFn):
    """Memoized jit of a projection function — same function-identity
    caching contract as :func:`compiled_step`, sharing its cache."""
    key = (proj_fn, "proj")
    step = _step_cache.get(key)
    if step is None:
        step = jax.jit(proj_fn)
        _step_cache[key] = step
    return step
