"""Pallas TPU kernel: fused factor scoring → seen-masking → top-k.

The generic driver (:mod:`polara_tpu.ops.scoring`) lets XLA fuse
``scores = proj @ Fᵀ`` with the masked top-k, but the dense
(chunk_users × n_items) score block still round-trips HBM between the
matmul and the top-k.  This kernel streams item tiles through VMEM
instead: each grid step computes one (U × TILE_N) score tile on the MXU,
clears that tile's seen items from a packed per-user bitmask (one uint32
word per 32 catalog items, streamed tile-aligned with the grid), and
merges the tile into a running top-k carry held in VMEM scratch via an
iterative max-select (``lax.top_k`` has no Mosaic lowering) — the full
score matrix never exists in HBM, so the pass stays matmul-bound instead
of HBM-bound for large catalogs.

Masking semantics: seen items are pushed to -inf, which agrees with the
reference ``downvote_seen_items`` ordering whenever ``k`` does not exceed
the number of unseen items (the practical regime; the reference's
shift-formula tail ordering for the degenerate case is preserved only by
the XLA path).  Ties resolve to the lowest item index, matching
``ops.topk.top_k_indices``.

All factor models share the ``proj @ Fᵀ`` structure (SVD: ``P·V`` then
``Vᵀ``; HybridSVD: right/left projectors; MF/LCE/iALS/BPR: user panels),
so one kernel serves the whole zoo.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polara_tpu.ops.topk import PAD_CONST

CARRY_WIDTH = 128  # lane-aligned top-k carry; k must not exceed this


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _score_topk_kernel(proj_ref, items_ref, seen_bits_ref, out_vals_ref,
                       out_idx_ref, vals_scr, idx_scr, *,
                       k: int, tile_n: int, n_items: int,
                       filter_seen: bool, interpret: bool,
                       tile_skip: bool):
    t = pl.program_id(1)            # item tile (minor, sequential)
    n_tiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        vals_scr[:] = jnp.full_like(vals_scr, -jnp.inf)
        idx_scr[:] = jnp.full_like(idx_scr, PAD_CONST)

    scores = jax.lax.dot_general(
        proj_ref[:], items_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (U, TILE_N)

    n_users = scores.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_users, tile_n), 1)
    cols = t * tile_n + lane
    scores = jnp.where(cols < n_items, scores, -jnp.inf)

    if filter_seen:
        # striped packing (see pack_seen_bits): lane l of the tile lives
        # in word (l % W) at bit (l // W), because pltpu.repeat tiles the
        # word block ([w0..wW]*32) rather than repeating elementwise
        words = seen_bits_ref[:]                     # (U, W = TILE_N//32)
        n_words = words.shape[1]
        if interpret:
            rep = jnp.tile(words, (1, 32))
        else:
            rep = pltpu.repeat(words, 32, axis=1)    # (U, TILE_N)
        bit = (rep >> (lane // n_words).astype(jnp.uint32)) & jnp.uint32(1)
        scores = jnp.where(bit != 0, -jnp.inf, scores)

    def merge():
        # merge tile into the running top-k by k-step max selection
        # (lane-dim dynamic writes are not Mosaic-legal, so the new carry
        # accumulates functionally through masked selects and lands in
        # scratch once).  Measured alternative: jnp.argmax
        # (reduce-with-index) lowers in Mosaic and gives the first-max
        # tie rule in one reduction, but runs ~10% SLOWER end-to-end than
        # this max/eq/minpos chain (r3 A/B: 0.192s vs 0.174s headline) —
        # keep the chain.
        work_vals = jnp.concatenate([vals_scr[:], scores], axis=1)
        work_idx = jnp.concatenate([idx_scr[:], cols], axis=1)
        width = work_vals.shape[1]
        pos = jax.lax.broadcasted_iota(jnp.int32, (n_users, width), 1)
        carry_pos = jax.lax.broadcasted_iota(
            jnp.int32, (n_users, vals_scr.shape[1]), 1)

        def select(i, state):
            wv, new_vals, new_idx = state
            best = jnp.max(wv, axis=1, keepdims=True)           # (U, 1)
            is_best = wv == best
            minpos = jnp.min(jnp.where(is_best, pos, width), axis=1,
                             keepdims=True)
            first = is_best & (pos == minpos)
            chosen = jnp.sum(jnp.where(first, work_idx, 0), axis=1,
                             keepdims=True).astype(new_idx.dtype)
            found = best > -jnp.inf
            slot = carry_pos == i
            new_vals = jnp.where(slot, best, new_vals)
            new_idx = jnp.where(slot & found, chosen, new_idx)
            return jnp.where(first, -jnp.inf, wv), new_vals, new_idx

        init = (work_vals,
                jnp.full_like(vals_scr[:], -jnp.inf),
                jnp.full_like(idx_scr[:], PAD_CONST))
        _, new_vals, new_idx = jax.lax.fori_loop(0, k, select, init)
        vals_scr[:] = new_vals
        idx_scr[:] = new_idx

    if tile_skip:
        # a tile whose best score cannot beat any user's current k-th
        # best is a no-op merge — skip the k-pass selection entirely.
        # Ties never displace (equal value resolves to the LOWER column
        # index, and carry entries come from earlier tiles), so <= is
        # safe.  Once the carries warm up, most tiles lose for every
        # user in the block and the merge cost collapses to one (U,
        # TILE_N) reduction + a scalar branch.
        kth_pos = jax.lax.broadcasted_iota(
            jnp.int32, (n_users, vals_scr.shape[1]), 1)
        kth_best = jnp.min(jnp.where(kth_pos < k, vals_scr[:], jnp.inf),
                           axis=1, keepdims=True)          # (U, 1)
        can_improve = jnp.any(jnp.max(scores, axis=1, keepdims=True)
                              > kth_best)

        @pl.when(can_improve)
        def _():
            merge()
    else:
        merge()

    @pl.when(t == n_tiles - 1)
    def _():
        out_vals_ref[:] = vals_scr[:]
        out_idx_ref[:] = idx_scr[:]


@functools.partial(jax.jit, static_argnames=("k", "filter_seen", "tile_n",
                                             "n_valid_cols", "block_users",
                                             "interpret", "return_values",
                                             "tile_skip"))
def fused_score_topk(proj: jax.Array, item_factors: jax.Array,
                     seen_bits: jax.Array, k: int,
                     filter_seen: bool = True, tile_n: int = 4096,
                     n_valid_cols: int | None = None,
                     block_users: int = 128,
                     interpret: bool = False,
                     return_values: bool = False,
                     tile_skip: bool = False
                     ) -> jax.Array | tuple[jax.Array, jax.Array]:
    """Top-k of ``proj @ item_factorsᵀ`` per user: indices, or
    (values, indices) with ``return_values=True``.

    ``seen_bits``: (n_users, ceil(n_items_padded / 32)) uint32 bitmask of
    seen items (see :func:`pack_seen_bits`).  Returns (n_users, k) int32
    indices, PAD_CONST where fewer than k valid items exist.  With
    ``return_values`` also returns the (n_users, k) f32 scores (-inf on
    PAD slots) — the 2-D mesh path merges per-item-shard candidates by
    score.
    """
    if k > CARRY_WIDTH:
        raise ValueError(f"pallas top-k supports k <= {CARRY_WIDTH}")
    n_users, rank = proj.shape
    n_items = item_factors.shape[0]
    n_valid = n_valid_cols if n_valid_cols is not None else n_items

    n_items_pad = _round_up(n_items, tile_n)
    if n_items_pad != n_items:
        item_factors = jnp.pad(item_factors,
                               ((0, n_items_pad - n_items), (0, 0)))
    n_tiles = n_items_pad // tile_n
    words_per_tile = tile_n // 32
    total_words = n_tiles * words_per_tile
    if seen_bits.shape[1] < total_words:
        seen_bits = jnp.pad(
            seen_bits, ((0, 0), (0, total_words - seen_bits.shape[1])))

    u_blk = min(block_users, _round_up(n_users, 8))
    n_users_pad = _round_up(n_users, u_blk)
    if n_users_pad != n_users:
        pad_rows = n_users_pad - n_users
        proj = jnp.pad(proj, ((0, pad_rows), (0, 0)))
        seen_bits = jnp.pad(seen_bits, ((0, pad_rows), (0, 0)))
    u_tiles = n_users_pad // u_blk

    kernel = functools.partial(
        _score_topk_kernel, k=k, tile_n=tile_n, n_items=n_valid,
        filter_seen=filter_seen, interpret=interpret,
        tile_skip=tile_skip)

    out_vals, out_idx = pl.pallas_call(
        kernel,
        grid=(u_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((u_blk, rank), lambda u, t: (u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, rank), lambda u, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u_blk, words_per_tile), lambda u, t: (u, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((u_blk, CARRY_WIDTH), lambda u, t: (u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u_blk, CARRY_WIDTH), lambda u, t: (u, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_users_pad, CARRY_WIDTH), jnp.float32),
            jax.ShapeDtypeStruct((n_users_pad, CARRY_WIDTH), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((u_blk, CARRY_WIDTH), jnp.float32),
            pltpu.VMEM((u_blk, CARRY_WIDTH), jnp.int32),
        ],
        interpret=interpret,
    )(proj.astype(jnp.float32), item_factors.astype(jnp.float32),
      seen_bits.astype(jnp.uint32))
    if return_values:
        return out_vals[:n_users, :k], out_idx[:n_users, :k]
    return out_idx[:n_users, :k]


@functools.partial(jax.jit, static_argnames=("n_rows", "n_cols", "tile_n"))
def pack_seen_bits_device(rows: jax.Array, cols: jax.Array, n_rows: int,
                          n_cols: int, tile_n: int = 4096) -> jax.Array:
    """Device-side :func:`pack_seen_bits` (same striped layout).

    At ~100M events the host packer plus the packed-panel upload through
    a slow link costs tens of seconds; on device the pack is one
    scatter-add.  Requires UNIQUE (row, col) pairs — each pair owns a
    distinct bit of its word, so the adds compose like bitwise-or; a
    duplicated event would corrupt neighbouring bits (the data model
    enforces uniqueness at construction, ``data/dataset.py``).
    """
    w = tile_n // 32
    n_tiles = max(1, -(-n_cols // tile_n))
    rows = rows.astype(jnp.int32)
    cols = cols.astype(jnp.int32)
    tile = cols // tile_n
    offset = cols % tile_n
    word = tile * w + (offset % w)
    bit = jnp.uint32(1) << (offset // w).astype(jnp.uint32)
    out = jnp.zeros((n_rows, n_tiles * w), jnp.uint32)
    return out.at[rows, word].add(bit, indices_are_sorted=False,
                                  unique_indices=False)


def clear_seen_bits_device(bits: jax.Array, rows: jax.Array,
                           cols: jax.Array,
                           tile_n: int = 4096) -> jax.Array:
    """Clear the (row, col) bits of a packed striped bitmask on device.

    The inverse scatter of :func:`pack_seen_bits_device` for pairs whose
    bit IS set (each unique pair owns its bit, so a wrapping uint32
    subtract clears exactly that bit).  Lets holdout studies reuse a
    full-stream bitmask without re-packing or re-uploading: zero wire
    beyond the (n_held,) id arrays.
    """
    w = tile_n // 32
    cols = cols.astype(jnp.int32)
    word = (cols // tile_n) * w + (cols % tile_n) % w
    bit = jnp.uint32(1) << ((cols % tile_n) // w).astype(jnp.uint32)
    return bits.at[rows.astype(jnp.int32), word].add(jnp.uint32(0) - bit)


def pack_seen_bits(rows: np.ndarray, cols: np.ndarray, n_rows: int,
                   n_cols: int, tile_n: int = 4096) -> np.ndarray:
    """Pack per-row seen columns into a striped uint32 bitmask.

    Layout (per item tile of ``tile_n`` columns, W = tile_n/32 words):
    tile-offset ``o`` lives in word ``o % W`` at bit ``o // W`` — the
    stripe order produced by ``pltpu.repeat``'s tiled broadcast inside the
    kernel.  Must be packed with the same ``tile_n`` the kernel runs with.
    Routes through the native C++ packer when available (the numpy
    ``bitwise_or.at`` scatter is ~100x slower at ML-10M scale).
    """
    from polara_tpu import native
    packed = native.pack_seen_bits(rows, cols, n_rows, n_cols, tile_n)
    if packed is not None:
        return packed
    w = tile_n // 32
    n_tiles = max(1, -(-n_cols // tile_n))
    words = np.zeros((n_rows, n_tiles * w), dtype=np.uint32)
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    tile = cols // tile_n
    offset = cols % tile_n
    np.bitwise_or.at(words, (rows, tile * w + (offset % w)),
                     np.uint32(1) << (offset // w).astype(np.uint32))
    return words
