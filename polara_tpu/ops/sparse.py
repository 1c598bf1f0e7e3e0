"""Device-resident representations of the interaction matrix.

The reference computes on ``scipy.sparse`` CSR with Numba kernels
(``polara/lib/sparse.py``).  On TPU the profitable layout is different:

* **dense HBM blocks** — rating matrices at MovieLens scale fit HBM
  comfortably (ML-10M dense f32 is ~2.9 GB), and dense matmuls run on the
  MXU at full throughput.  This is the default hot path.
* **sorted COO + segment reductions** — for matrices that do not fit
  densely, matvecs/matmats run as gather → multiply → ``segment_sum``
  chains, which XLA lowers to efficient scatter-adds.  This replaces the
  reference's ``csc_matvec``/``sparse_dot`` Numba kernels
  (``polara/lib/sparse.py:35-141``).

Both layouts implement the same :class:`MatmulOperator` protocol consumed by
the randomized SVD and the scoring pipeline.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time
from functools import partial
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _stage_prof(label: str, t_prev: float, *sync_arrays) -> float:
    """Staging phase profiler, enabled by ``POLARA_STAGING_PROFILE=1``.

    Syncs the given device arrays through a 4-byte corner fetch (the
    tunnel's ``block_until_ready`` does not synchronize — CLAUDE.md) and
    logs the elapsed phase time to stderr.  Off by default: returns
    ``t_prev`` untouched so un-profiled staging stays fully async.
    """
    if not os.environ.get("POLARA_STAGING_PROFILE"):
        return t_prev
    for a in sync_arrays:
        if a is not None:
            np.asarray(jax.numpy.ravel(a)[:1])
    now = time.perf_counter()
    print(f"      [stage] {label}: {now - t_prev:.2f}s",
          file=sys.stderr, flush=True)
    return now


# --------------------------------------------------------------------------
# operator protocol
# --------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MatmulOperator:
    """A linear operator defined by blocked matmuls ``A @ X`` / ``A.T @ X``.

    Plays the role of ``scipy.sparse.linalg.LinearOperator`` in the
    reference's HybridSVD build (``polara/recommender/hybrid/models.py:
    368-384``), generalized to matrix-matrix products since randomized SVD
    iterates on k-wide panels rather than single vectors.

    Registered as a pytree: ``operands`` (the backing arrays) are traced
    children while the matmul callables are static aux data — so operators
    pass straight through ``jax.jit`` without baking multi-GB arrays into
    the compiled program as constants, and compiled solvers are reused
    across rebuilds as long as the callables and shapes match.  The
    callables must be module-level functions (stable identity), taking
    ``(operands, x)``.
    """
    shape: Tuple[int, int]
    mm_fn: Callable    # (operands, (n, k), out_dim) -> (out_dim, k)
    rmm_fn: Callable   # (operands, (m, k), out_dim) -> (out_dim, k)
    operands: Tuple = ()
    dtype: jnp.dtype = jnp.float32

    def mm(self, x: jax.Array) -> jax.Array:
        return self.mm_fn(self.operands, x, self.shape[0])

    def rmm(self, x: jax.Array) -> jax.Array:
        return self.rmm_fn(self.operands, x, self.shape[1])

    @property
    def T(self) -> "MatmulOperator":
        return MatmulOperator(shape=(self.shape[1], self.shape[0]),
                              mm_fn=self.rmm_fn, rmm_fn=self.mm_fn,
                              operands=self.operands, dtype=self.dtype)

    def tree_flatten(self):
        return self.operands, (self.shape, self.mm_fn, self.rmm_fn,
                               self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, mm_fn, rmm_fn, dtype = aux
        return cls(shape=shape, mm_fn=mm_fn, rmm_fn=rmm_fn,
                   operands=tuple(children), dtype=dtype)


def _dense_mm(operands, x, out_dim):
    return operands[0] @ x


def _dense_rmm(operands, x, out_dim):
    return operands[0].T @ x


def _coo_mm(operands, x, out_dim):
    rows, cols, vals = operands
    return jax.ops.segment_sum(vals[:, None] * x[cols], rows,
                               num_segments=out_dim)


def _coo_rmm(operands, x, out_dim):
    rows, cols, vals = operands
    return jax.ops.segment_sum(vals[:, None] * x[rows], cols,
                               num_segments=out_dim)


def dense_operator(matrix: jax.Array) -> MatmulOperator:
    return MatmulOperator(shape=matrix.shape, mm_fn=_dense_mm,
                          rmm_fn=_dense_rmm, operands=(matrix,),
                          dtype=matrix.dtype)


def _dense_lowp_mm(operands, x, out_dim):
    (m,) = operands
    return (m @ x.astype(m.dtype)).astype(x.dtype)


def _dense_lowp_rmm(operands, x, out_dim):
    (m,) = operands
    return (m.T @ x.astype(m.dtype)).astype(x.dtype)


def dense_power_operator(matrix: jax.Array,
                         dtype=jnp.bfloat16) -> MatmulOperator:
    """Low-precision matvec operator for rSVD power iterations.

    Stores the (large) matrix in ``dtype`` — HALVING the HBM traffic
    that dominates subspace iteration at rating-matrix scale — while
    panels stay in the caller's precision (inputs cast down per matmul,
    outputs cast back up, so CholeskyQR2 runs at full panel precision).
    Pass as ``randomized_svd(..., power_operator=...)`` next to the
    full-precision operator: the final Rayleigh–Ritz projection
    ``B = QᵀA`` uses the full-precision matrix and recovers the accuracy
    a pure-bf16 pipeline would lose (measured: identical max triplet
    residual to the all-f32 path on the calibrated ML-10M workload).
    """
    lo = matrix.astype(dtype)
    return MatmulOperator(shape=matrix.shape, mm_fn=_dense_lowp_mm,
                          rmm_fn=_dense_lowp_rmm, operands=(lo,),
                          dtype=matrix.dtype)


# --------------------------------------------------------------------------
# COO container
# --------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CooMatrix:
    """Row-sorted COO sparse matrix on device."""
    rows: jax.Array     # int32 (nnz,)
    cols: jax.Array     # int32 (nnz,)
    vals: jax.Array     # float (nnz,)
    shape: Tuple[int, int]

    def tree_flatten(self):
        return (self.rows, self.cols, self.vals), self.shape

    @classmethod
    def tree_unflatten(cls, shape, children):
        rows, cols, vals = children
        return cls(rows, cols, vals, shape)

    @classmethod
    def from_numpy(cls, rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                   shape: Tuple[int, int],
                   dtype: jnp.dtype = jnp.float32) -> "CooMatrix":
        order = np.argsort(rows, kind="stable")
        return cls(jnp.asarray(rows[order], dtype=jnp.int32),
                   jnp.asarray(cols[order], dtype=jnp.int32),
                   jnp.asarray(vals[order], dtype=dtype),
                   tuple(int(s) for s in shape))

    @property
    def nnz(self) -> int:
        return self.rows.shape[0]

    def to_dense(self) -> jax.Array:
        out = jnp.zeros(self.shape, dtype=self.vals.dtype)
        return out.at[self.rows, self.cols].add(self.vals)

    def matmul(self, x: jax.Array) -> jax.Array:
        """``A @ x`` via gather + segment_sum over rows."""
        contrib = self.vals[:, None] * x[self.cols]
        return jax.ops.segment_sum(contrib, self.rows,
                                   num_segments=self.shape[0])

    def rmatmul(self, x: jax.Array) -> jax.Array:
        """``A.T @ x`` via gather + segment_sum over columns."""
        contrib = self.vals[:, None] * x[self.rows]
        return jax.ops.segment_sum(contrib, self.cols,
                                   num_segments=self.shape[1])

    def operator(self) -> MatmulOperator:
        return MatmulOperator(shape=self.shape, mm_fn=_coo_mm,
                              rmm_fn=_coo_rmm,
                              operands=(self.rows, self.cols, self.vals),
                              dtype=self.vals.dtype)

    def chunked_operator(self, event_chunk: int = 4_000_000
                         ) -> MatmulOperator:
        """Streaming operator over this matrix's events (see
        :func:`chunked_coo_operator`) — the arrays are already resident
        and row-sorted, so staging is a device-side reshape plus one
        tiny host sync for the static chunk span."""
        if self.nnz == 0:
            raise ValueError("empty matrix")
        return _stage_chunked(self.rows, self.cols.astype(jnp.int32),
                              self.vals, self.shape, event_chunk)

    def tiled_operator(self, event_chunk: int = 4_000_000,
                       tile: int = 128) -> MatmulOperator:
        """Tile-aligned streaming operator (see
        :func:`tiled_coo_operator`) — the arrays are already resident
        and row-sorted."""
        if self.nnz == 0:
            raise ValueError("empty matrix")
        return tiled_coo_operator(self.rows, self.cols, self.vals,
                                  self.shape, event_chunk=event_chunk,
                                  tile=tile, assume_sorted=True,
                                  dtype=self.vals.dtype)

    def split_operator(self, head_items="auto",
                       head_budget_gb: float = 4.0,
                       event_chunk: int = 4_000_000,
                       tile: int = 128) -> MatmulOperator:
        """Head/tail split streaming operator (see
        :func:`split_coo_operator`) — the arrays are already resident
        and row-sorted."""
        if self.nnz == 0:
            raise ValueError("empty matrix")
        return split_coo_operator(self.rows, self.cols, self.vals,
                                  self.shape, head_items=head_items,
                                  head_budget_gb=head_budget_gb,
                                  event_chunk=event_chunk, tile=tile,
                                  assume_sorted=True,
                                  dtype=self.vals.dtype)

    def row_nnz(self) -> jax.Array:
        ones = jnp.ones_like(self.vals)
        return jax.ops.segment_sum(ones, self.rows,
                                   num_segments=self.shape[0])

    def col_nnz(self) -> jax.Array:
        ones = jnp.ones_like(self.vals)
        return jax.ops.segment_sum(ones, self.cols,
                                   num_segments=self.shape[1])


def coo_from_arrays(idx: np.ndarray, val: np.ndarray,
                    shape: Tuple[int, ...],
                    dtype: jnp.dtype = jnp.float32) -> CooMatrix:
    """Build from the data model's ``to_coo`` output ((nnz, 2) index)."""
    return CooMatrix.from_numpy(idx[:, 0], idx[:, 1], val, shape[:2], dtype)


# --------------------------------------------------------------------------
# chunked (streaming) COO operator — beyond-HBM-dense scale
# --------------------------------------------------------------------------

def _chunked_mm(operands, x, out_dim):
    """``A @ x`` streamed over event chunks.

    Each scan step materializes only one (event_chunk, k) contribution
    block, reduces it to the chunk's local row span with a sorted
    ``segment_sum``, and accumulates into the output through clamped
    dynamic slices — peak HBM beyond inputs/outputs is one chunk block,
    independent of nnz.
    """
    lrows, cols, vals, starts, probe = operands
    span = probe.shape[0]
    k = x.shape[1]

    def body(acc, chunk):
        lr, cl, vl, st = chunk
        contrib = vl[:, None] * x[cl]
        seg = jax.ops.segment_sum(contrib, lr, num_segments=span,
                                  indices_are_sorted=True)
        zero = jnp.zeros((), st.dtype)
        cur = jax.lax.dynamic_slice(acc, (st, zero), (span, k))
        return jax.lax.dynamic_update_slice(acc, cur + seg,
                                            (st, zero)), None

    acc = jnp.zeros((out_dim, k), x.dtype)
    acc, _ = jax.lax.scan(body, acc, (lrows, cols, vals, starts))
    return acc


def _chunked_rmm(operands, x, out_dim):
    """``A.T @ x`` streamed over event chunks: gather the chunk's local
    slice of ``x`` (rows sorted, so each chunk touches a contiguous row
    span), scatter-reduce over columns."""
    lrows, cols, vals, starts, probe = operands
    span = probe.shape[0]
    k = x.shape[1]

    def body(acc, chunk):
        lr, cl, vl, st = chunk
        xs = jax.lax.dynamic_slice(x, (st, jnp.zeros((), st.dtype)),
                                   (span, k))
        contrib = vl[:, None] * xs[lr]
        return acc + jax.ops.segment_sum(contrib, cl,
                                         num_segments=out_dim), None

    acc = jnp.zeros((out_dim, k), x.dtype)
    acc, _ = jax.lax.scan(body, acc, (lrows, cols, vals, starts))
    return acc


def chunked_coo_operator(rows: np.ndarray, cols: np.ndarray,
                         vals: np.ndarray, shape: Tuple[int, int],
                         event_chunk: int = 2_000_000,
                         assume_sorted: bool = False,
                         dtype: jnp.dtype = jnp.float32) -> MatmulOperator:
    """Streaming COO operator for matrices too large to densify in HBM.

    The plain :meth:`CooMatrix.operator` materializes an (nnz, k)
    contribution block per matmul — at Netflix scale (~100M events,
    k≈60) that is ~24 GB, past a v5e chip's HBM.  This operator reshapes
    the row-sorted event stream into static ``(n_chunks, event_chunk)``
    panels and reduces chunk by chunk under ``lax.scan``:

    * ``A @ x``: one gather + multiply + *local* sorted ``segment_sum``
      per chunk (the chunk's rows cover a contiguous span because events
      are row-sorted), accumulated with clamped dynamic slices;
    * ``A.T @ x``: the chunk's row span of ``x`` is sliced out, gathered
      per event, and scatter-reduced over columns (the column dimension
      of recommender matrices is the small one).

    Peak live memory is one (event_chunk, k) block — nnz-independent —
    so problem size is bounded by the event stream (~12 bytes/event),
    not the dense footprint.  Chunk starts are pre-clamped to
    ``min(first_row, n_rows - span)`` so every dynamic slice is in
    bounds; rows crossing a chunk boundary are accumulated additively,
    so the split is harmless.

    Replaces the reference's out-of-core posture (scipy CSR kept on the
    host, ``polara/lib/sparse.py:35-141``) for beyond-HBM matrices.

    Staging runs on device: raw event arrays upload once and the
    pad/reshape/local-row arithmetic is device work (at ~100M events the
    host copies alone cost minutes on a slow host), with one tiny host
    sync for the static chunk span.
    """
    nnz = len(rows)
    if nnz == 0:
        raise ValueError("empty matrix")
    rows, cols, vals, rows_sorted = _upload_event_stream(
        rows, cols, vals, shape, dtype, assume_sorted)
    if not rows_sorted and not bool(jnp.all(jnp.diff(rows) >= 0)):
        order = jnp.argsort(rows, stable=True)
        rows, cols, vals = rows[order], cols[order], vals[order]
    return _stage_chunked(rows, cols, vals, shape, event_chunk)


def _upload_event_stream(rows, cols, vals, shape, dtype,
                         assume_sorted: bool):
    """Host→device upload of a COO event stream with lossless wire
    compression.

    At beyond-HBM scale the raw upload IS the staging bottleneck on
    TPU-adjacent hosts (1.2 GB ≈ 68 s through the benchmark tunnel, and
    a real PCIe host still moves it at wire speed): minor ids ride as
    int16 when the axis fits, integer-valued ratings as int8 codes, and
    a sorted major axis as uint8 run deltas rebuilt by one device
    cumsum — 392 MB instead of 1.2 GB at Netflix scale.  Every
    compression is exact (single host pass proves applicability) and
    falls back to the raw dtype otherwise; device-array inputs pass
    through untouched.  Returns ``(rows, cols, vals, rows_sorted)``
    where ``rows_sorted`` folds in the host-side sortedness proof so
    callers can skip the device check.
    """
    m, n = (int(s) for s in shape)

    rows_sorted = bool(assume_sorted)
    if isinstance(rows, np.ndarray):
        r = np.ascontiguousarray(rows)
        # diff in int64: unsigned dtypes wrap under subtraction, which
        # would "prove" any stream sorted (and mis-encode the deltas)
        d = (np.diff(r.astype(np.int64, copy=False)) if r.size > 1
             else np.zeros(0, np.int64))
        if not rows_sorted:
            rows_sorted = bool(d.size == 0 or int(d.min()) >= 0)
        if rows_sorted and d.size and int(d.min()) >= 0 \
                and int(d.max()) <= 255:
            deltas = np.empty(r.size, np.uint8)
            deltas[0] = 0
            deltas[1:] = d
            rows_d = (jnp.cumsum(jnp.asarray(deltas).astype(jnp.int32))
                      + jnp.int32(int(r[0])))
        elif m <= (1 << 15):
            rows_d = jnp.asarray(r.astype(np.int16)).astype(jnp.int32)
        else:
            rows_d = jnp.asarray(r, jnp.int32)
    else:
        rows_d = jnp.asarray(rows, jnp.int32)

    if isinstance(cols, np.ndarray) and n <= (1 << 15):
        cols_d = jnp.asarray(
            np.ascontiguousarray(cols).astype(np.int16)).astype(jnp.int32)
    else:
        cols_d = jnp.asarray(cols, jnp.int32)

    vals_d = None
    if isinstance(vals, np.ndarray) and vals.size:
        v = vals
        if v.dtype.kind in "iu":
            if -128 <= int(v.min()) and int(v.max()) <= 127:
                vals_d = jnp.asarray(v.astype(np.int8)).astype(dtype)
        elif v.dtype.kind == "f":
            vmin, vmax = float(v.min()), float(v.max())
            # NaN anywhere makes the comparisons False -> raw fallback
            if -127.0 <= vmin and vmax <= 127.0 \
                    and np.array_equal(v, np.rint(v)):
                vals_d = jnp.asarray(v.astype(np.int8)).astype(dtype)
    if vals_d is None:
        vals_d = jnp.asarray(vals, dtype)
    return rows_d, cols_d, vals_d, rows_sorted


def _stage_chunked(rows: jax.Array, cols: jax.Array, vals: jax.Array,
                   shape: Tuple[int, int],
                   event_chunk: int) -> MatmulOperator:
    """Device-side staging shared by :func:`chunked_coo_operator` and
    :meth:`CooMatrix.chunked_operator` (rows must be sorted)."""
    m, n = (int(s) for s in shape)
    nnz = rows.shape[0]
    event_chunk = min(event_chunk, nnz)
    n_chunks = -(-nnz // event_chunk)
    pad = n_chunks * event_chunk - nnz
    if pad:
        # padding events replicate the last row with value 0 — they land
        # inside the final chunk's span and contribute nothing
        rows = jnp.concatenate([rows,
                                jnp.broadcast_to(rows[-1], (pad,))])
        cols = jnp.concatenate([cols, jnp.zeros((pad,), cols.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])
    rows = rows.reshape(n_chunks, event_chunk)
    span = int(jnp.max(rows[:, -1] - rows[:, 0])) + 1   # tiny host sync
    span = min(max(span, 1), m)
    starts = jnp.minimum(rows[:, 0], jnp.int32(m - span)).astype(jnp.int32)
    lrows = (rows - starts[:, None]).astype(jnp.int32)

    operands = (lrows, cols.reshape(n_chunks, event_chunk),
                vals.reshape(n_chunks, event_chunk), starts,
                jnp.zeros((span,), jnp.int8))
    return MatmulOperator(shape=(m, n), mm_fn=_chunked_mm,
                          rmm_fn=_chunked_rmm, operands=operands,
                          dtype=vals.dtype)


# --------------------------------------------------------------------------
# tile-aligned (ELL) streaming operator — beyond-HBM scale, scatter-free
# --------------------------------------------------------------------------

def _tiled_pass(side, x, out_dim):
    """One streamed ``A @ x`` pass over a tile-aligned event side.

    Every tile of ``tile`` consecutive events belongs to exactly one
    output row, so the per-chunk reduction is a batched (1, tile) @
    (tile, k) contraction (MXU work) followed by a ``segment_sum`` over
    *tile owners* — ``tile``× fewer scatter ids than the event-level
    reduction of :func:`_chunked_mm`, whose scatter lowering costs ~2.5×
    the pure gather floor (measured on chip, see docs/PERFORMANCE.md).
    """
    minor_c, vals_c, lowner, starts, probe = side
    span = probe.shape[0]
    k = x.shape[1]
    tpc = lowner.shape[1]
    tile = minor_c.shape[1] // tpc

    def body(acc, chunk):
        cl, vl, ow, st = chunk
        y = x[cl].reshape(tpc, tile, k)
        contrib = jnp.einsum("ptk,pt->pk", y, vl.reshape(tpc, tile),
                             preferred_element_type=x.dtype)
        seg = jax.ops.segment_sum(contrib, ow, num_segments=span,
                                  indices_are_sorted=True)
        zero = jnp.zeros((), st.dtype)
        cur = jax.lax.dynamic_slice(acc, (st, zero), (span, k))
        return jax.lax.dynamic_update_slice(acc, cur + seg,
                                            (st, zero)), None

    acc = jnp.zeros((out_dim, k), x.dtype)
    acc, _ = jax.lax.scan(body, acc,
                          (minor_c, vals_c, lowner, starts))
    return acc


def _tiled_mm(operands, x, out_dim):
    return _tiled_pass(operands[0], x, out_dim)


def _tiled_rmm(operands, x, out_dim):
    return _tiled_pass(operands[1], x, out_dim)

# NOTE: a bf16 "power operator" sibling (downcast value panels + bf16
# gather, the streaming analogue of dense_power_operator) was measured
# on chip at Netflix scale and LOST: 1.218 s per mm+rmm roundtrip vs
# 0.793 s for the f32 tiled pass at width 100 — the sub-word gather
# lowers worse than the f32 one and the panel downcast adds a pass.
# Deleted rather than retained unmeasured.


def gather_padded_panels(owner: jax.Array, base: jax.Array,
                         counts: jax.Array, ev_start: jax.Array,
                         minor: jax.Array, vals: jax.Array,
                         n_tiles: int, tile: int
                         ) -> Tuple[jax.Array, jax.Array]:
    """Tile-padded (minor, value) panels built with GATHERS, not
    scatters.

    The event→slot map (``base[entity]`` + within-entity position) is
    strictly monotonic, so its inverse is a pure per-slot lookup —
    every slot in tile ``t`` belongs to ``owner[t]``, its within-entity
    position is the slot offset past ``base[owner[t]]``, and real
    positions read the original stream while pad positions read slot 0
    with value 0.  A ~100M-event scatter lowers ~10× worse than these
    gathers on TPU (25 s → ~3 s per side at Netflix scale, identical
    panels).  Shared by the tiled COO operator and the streaming-iALS
    staging (`ops/implicit.py:stage_events_side`).
    """
    e_pad = n_tiles * tile
    ent = jnp.broadcast_to(owner[:, None], (n_tiles, tile)).reshape(-1)
    p = jnp.arange(e_pad, dtype=jnp.int32) - base[ent]
    valid = p < counts[ent]
    src = jnp.where(valid, ev_start[ent] + jnp.minimum(p, counts[ent] - 1),
                    0)
    minor_p = jnp.where(valid, minor.astype(jnp.int32)[src], 0)
    vals_p = jnp.where(valid, vals[src], jnp.zeros((), vals.dtype))
    return minor_p, vals_p


def _stage_tiled_side(maj: jax.Array, minor: jax.Array, vals: jax.Array,
                      n_major: int, event_chunk: int, tile: int):
    """Device-side staging of one tile-aligned event side.

    ``maj`` must be sorted ascending.  Every entity's event list pads to
    a multiple of ``tile`` (padding events carry value 0 and map to
    column 0, so they contribute nothing), the padded stream reshapes
    into static ``(n_chunks, event_chunk)`` panels, and each chunk
    carries its tiles' *local* owner ids plus a clamped row-span start —
    the same accumulation scheme as :func:`_stage_chunked`, with the
    segment ids coarsened from events to tiles.  Two tiny host syncs fix
    the static padded-event count and chunk span.
    """
    nnz = maj.shape[0]
    maj = maj.astype(jnp.int32)
    ones = jnp.ones((nnz,), jnp.int32)
    counts = jax.ops.segment_sum(ones, maj, num_segments=n_major,
                                 indices_are_sorted=True)
    pc = -(-counts // tile) * tile
    base = jnp.cumsum(pc) - pc
    ev_start = jnp.cumsum(counts) - counts
    e_pad_raw = int(jnp.sum(pc))                  # host sync (scalar)
    event_chunk = -(-min(event_chunk, e_pad_raw) // tile) * tile
    n_chunks = -(-e_pad_raw // event_chunk)
    e_pad = n_chunks * event_chunk

    tiles_per = pc // tile
    n_tiles = e_pad // tile
    # trailing chunk-alignment tiles carry zero values; jnp.repeat pads
    # them with the last entity id, which keeps owner ids sorted
    owner = jnp.repeat(jnp.arange(n_major, dtype=jnp.int32), tiles_per,
                       total_repeat_length=n_tiles)

    minor_p, vals_p = gather_padded_panels(owner, base, counts, ev_start,
                                           minor, vals, n_tiles, tile)

    tpc = event_chunk // tile
    owner_c = owner.reshape(n_chunks, tpc)
    span = int(jnp.max(owner_c[:, -1] - owner_c[:, 0])) + 1  # host sync
    span = min(max(span, 1), n_major)
    starts = jnp.minimum(owner_c[:, 0],
                         jnp.int32(n_major - span)).astype(jnp.int32)
    lowner = (owner_c - starts[:, None]).astype(jnp.int32)
    return (minor_p.reshape(n_chunks, event_chunk),
            vals_p.reshape(n_chunks, event_chunk),
            lowner, starts, jnp.zeros((span,), jnp.int8))


def tiled_coo_operator(rows, cols, vals, shape: Tuple[int, int],
                       event_chunk: int = 4_000_000, tile: int = 128,
                       assume_sorted: bool = False,
                       dtype: jnp.dtype = jnp.float32) -> MatmulOperator:
    """Tile-aligned streaming COO operator (scatter-free hot path).

    Same contract and accumulation scheme as
    :func:`chunked_coo_operator`, but both passes lay the event stream
    out so each MXU-tile of events belongs to one output row (the
    layout proven out by the streaming iALS, `ops/implicit.py:
    stage_events_side`): ``A @ x`` streams a row-sorted copy, ``A.T @ x``
    a column-sorted copy, and each chunk reduces with one batched
    (tile, k) contraction plus a tiny per-tile segment_sum instead of an
    event-level scatter.  Costs one extra padded copy of the event
    stream (~8 bytes/event per side + ≤``tile``/2 pad events per entity)
    and buys back the ~2.5× scatter-lowering overhead that dominates
    every factorization pass at beyond-HBM scale.

    Replaces the reference's out-of-core posture (host scipy CSR +
    ARPACK, ``polara/lib/sparse.py:35-141``) for matrices whose dense
    block exceeds HBM.
    """
    nnz = len(rows)
    if nnz == 0:
        raise ValueError("empty matrix")
    if tile < 1:
        raise ValueError("tile must be positive")
    tp = time.perf_counter()
    rows, cols, vals, rows_sorted = _upload_event_stream(
        rows, cols, vals, shape, dtype, assume_sorted)
    if not rows_sorted and not bool(jnp.all(jnp.diff(rows) >= 0)):
        order = jnp.argsort(rows, stable=True)
        rows, cols, vals = rows[order], cols[order], vals[order]
    m, n = (int(s) for s in shape)
    tp = _stage_prof("upload/sort", tp, rows, cols, vals)
    row_side = _stage_tiled_side(rows, cols, vals, m, event_chunk, tile)
    tp = _stage_prof("row side", tp, row_side[0], row_side[1])
    corder = jnp.argsort(cols, stable=True)
    col_side = _stage_tiled_side(cols[corder], rows[corder], vals[corder],
                                 n, event_chunk, tile)
    tp = _stage_prof("col side", tp, col_side[0], col_side[1])
    return MatmulOperator(shape=(m, n), mm_fn=_tiled_mm,
                          rmm_fn=_tiled_rmm,
                          operands=(row_side, col_side), dtype=vals.dtype)


# --------------------------------------------------------------------------
# head/tail split streaming operator — Zipf head on the MXU
# --------------------------------------------------------------------------

def _head_mm_blocks(d, head_ids, x, out_dim):
    """Dense head contribution to ``A @ x``: ``D @ x[head_ids]``.

    ``d`` is stored ``(n_blocks, block_rows, P)``; blocks upcast to the
    panel dtype on the fly inside the scan, so a full-width
    floating-point copy of the head block never exists in HBM.
    """
    xh = x[head_ids]

    def body(carry, blk):
        return carry, jnp.matmul(blk.astype(x.dtype), xh,
                                 preferred_element_type=x.dtype)

    _, out = jax.lax.scan(body, jnp.zeros((), x.dtype), d)
    return out.reshape(-1, x.shape[1])[:out_dim]


def _head_rmm_blocks(d, x):
    """Dense head contribution to ``A.T @ x``: ``D.T @ x`` as a blocked
    accumulation (returns the (P, k) head-row panel)."""
    nb, br, p = d.shape
    pad = nb * br - x.shape[0]
    xb = jnp.pad(x, ((0, pad), (0, 0))).reshape(nb, br, -1)

    def body(acc, pair):
        blk, xblk = pair
        return acc + jnp.matmul(blk.astype(x.dtype).T, xblk,
                                preferred_element_type=x.dtype), None

    acc, _ = jax.lax.scan(body, jnp.zeros((p, x.shape[1]), x.dtype),
                          (d, xb))
    return acc


def _split_mm(operands, x, out_dim):
    (d, head_ids), row_side, _ = operands
    out = _head_mm_blocks(d, head_ids, x, out_dim)
    if row_side is not None:
        out = out + _tiled_pass(row_side, x, out_dim)
    return out


def _split_rmm(operands, x, out_dim):
    (d, head_ids), _, col_side = operands
    head = _head_rmm_blocks(d, x)
    if col_side is not None:
        # tail events never reference head columns, so the head rows of
        # the tail pass are exact zeros — add == set
        return _tiled_pass(col_side, x, out_dim).at[head_ids].add(head)
    return jnp.zeros((out_dim, x.shape[1]), x.dtype).at[head_ids].set(head)


def build_head_block(hr, hp, hv, m_pad: int, p: int, dtype,
                     head_budget_gb: float = 4.0,
                     int8_ok: Optional[bool] = None,
                     _max_flat_cells: int = 2 ** 31 - 1) -> jax.Array:
    """Dense ``(m_pad, p)`` head block from head events.

    ``hr`` are (padded) row ids, ``hp`` the head-local column positions
    in ``[0, p)``, ``hv`` the event values.  Shared by
    :func:`split_coo_operator` and the mesh tier
    (``parallel.distributed.distributed_chunked_rsvd``), which builds
    the block over device-band-padded row ids and shards it by rows.

    The block scatters as flat 1-D segment_sums: a 2-D scatter's
    (nnz, 2) index matrix tiles to lane width on TPU — a ~64x padded
    copy that cannot allocate at 100M events.  Flat cell ids must stay
    in int32, so wide heads build in column groups of pg <= int32/m_pad
    columns each and concatenate.  The per-group accumulate runs in the
    event dtype (exact for integer ratings up to 2**24 per cell), so
    the staging transient is m_pad*pg float cells; it is capped at the
    head budget so staging never peaks past the resident block's
    allowance even when the int8 storage format makes p 4x wider.
    """
    if int8_ok is None:
        int8_ok = bool(jnp.all((hv == jnp.round(hv))
                               & (jnp.abs(hv) <= 127.0)))
    d_dtype = jnp.int8 if int8_ok else dtype
    pg = min(p, _max_flat_cells // m_pad)
    pg = min(pg, max(1, int(head_budget_gb * 2 ** 30)
                     // (m_pad * jnp.dtype(dtype).itemsize)))
    if pg < 1:      # pragma: no cover - >2B-row matrices
        raise ValueError("matrix has too many rows for int32 cell ids")
    groups = []
    for g0 in range(0, p, pg):
        gw = min(pg, p - g0)
        in_g = (hp >= g0) & (hp < g0 + gw)
        gv = jnp.where(in_g, hv, jnp.zeros((), hv.dtype))
        gp = jnp.where(in_g, hp - g0, 0)
        # Accumulate in the event dtype, NOT int8: duplicate (row, col)
        # events can sum past 127 even when every individual value fits.
        # int8 is a storage format, decided per group from the actual
        # cell sums; one overflowing group demotes the whole head to the
        # float dtype (int8->float upcast of earlier groups is lossless).
        acc = jax.ops.segment_sum(
            gv, hr * jnp.int32(gw) + gp,
            num_segments=m_pad * gw).reshape(m_pad, gw)
        if d_dtype == jnp.int8:
            if bool(jnp.max(jnp.abs(acc)) <= 127.0):
                acc = acc.astype(jnp.int8)
            else:
                d_dtype = dtype
        groups.append(acc)
    if d_dtype != jnp.int8:
        groups = [g.astype(dtype) for g in groups]
    return groups[0] if len(groups) == 1 else jnp.concatenate(groups,
                                                              axis=1)


def split_coo_operator(rows, cols, vals, shape: Tuple[int, int],
                       head_items="auto", head_budget_gb: float = 4.0,
                       event_chunk: int = 4_000_000, tile: int = 32,
                       col_tile: int = 128,
                       head_block_rows: int = 4096,
                       assume_sorted: bool = False,
                       min_coverage: float = 0.15,
                       dtype: jnp.dtype = jnp.float32,
                       _max_flat_cells: int = 2 ** 31 - 1
                       ) -> MatmulOperator:
    """Head/tail split streaming operator: the Zipf head rides the MXU.

    The tile-aligned streaming operator's passes are bound by the gather
    engine (~400 B-granule random access sustains ~12 % of sequential
    HBM bandwidth — measured and priced in docs/PERFORMANCE.md).  But
    interaction logs are Zipf-skewed over items, so a small dense
    ``(m, P)`` block over the ``P`` most-rated items absorbs most of the
    event mass into *sequential* HBM reads + MXU matmuls:

    * events on the top-``P`` items scatter once, at staging, into a
      dense head block ``D`` — stored **int8 when every value is an
      integer in [-127, 127]** (lossless for 1..5-star data, 4x the
      f32 head width per byte) and upcast block-by-block inside the
      pass scan;
    * the remaining tail events stay in the tile-aligned gather layout
      (:func:`tiled_coo_operator`), so per-pass gather traffic drops by
      the head's coverage fraction.

    ``head_items="auto"`` sizes ``P`` from ``head_budget_gb``; if the
    resulting head would cover less than ``min_coverage`` of the events
    (near-uniform item margins), the split cannot pay and the plain
    tiled operator is returned instead.  ``mm``/``rmm`` results are
    exactly the f32 sums the tiled operator computes — the int8 head is
    a storage format, not a precision trade.

    The two tail sides deliberately use different tile sizes (measured
    on chip at Netflix scale): the row side's per-USER event lists are
    short once the head absorbs the popular-item mass, so 128-tiles
    would double the padded stream (34M real -> 76M padded) — ``tile=32``
    keeps padding ~17% and is the mm-pass knee (0.137s vs 0.207s at
    128); the col side's per-ITEM lists stay long, and smaller tiles
    only add per-tile overhead there (rmm 0.232s at 128, 0.245s at 32).

    Replaces the reference's out-of-core posture (host scipy CSR +
    ARPACK, ``polara/lib/sparse.py:35-141``) at beyond-HBM scale, with
    the hot 80 % of the event mass moved off the gather engine.
    """
    nnz = len(rows)
    if nnz == 0:
        raise ValueError("empty matrix")
    if tile < 1:
        raise ValueError("tile must be positive")
    tp = time.perf_counter()
    rows, cols, vals, rows_sorted = _upload_event_stream(
        rows, cols, vals, shape, dtype, assume_sorted)
    if not rows_sorted and not bool(jnp.all(jnp.diff(rows) >= 0)):
        order = jnp.argsort(rows, stable=True)
        rows, cols, vals = rows[order], cols[order], vals[order]
    m, n = (int(s) for s in shape)
    tp = _stage_prof("upload/sort", tp, rows, cols, vals)

    int8_ok = bool(jnp.all((vals == jnp.round(vals))
                           & (jnp.abs(vals) <= 127.0)))
    tp = _stage_prof("int8 check", tp)
    d_dtype = jnp.int8 if int8_ok else dtype
    br = min(head_block_rows, m)
    n_blocks = -(-m // br)
    m_pad = n_blocks * br
    if head_items == "auto":
        p = int(head_budget_gb * 2 ** 30) \
            // (m * jnp.dtype(d_dtype).itemsize)
    else:
        p = int(head_items)
    p = min(p, n)
    if p >= 128:
        p = (p // 128) * 128     # lane-aligned head width

    def _plain_tiled():
        return tiled_coo_operator(rows, cols, vals, (m, n),
                                  event_chunk=event_chunk, tile=col_tile,
                                  assume_sorted=True, dtype=dtype)

    if p < 1:
        return _plain_tiled()

    if p < n:
        counts = jax.ops.segment_sum(jnp.ones((nnz,), jnp.int32), cols,
                                     num_segments=n)
        top_counts, top_idx = jax.lax.top_k(counts, p)
        if float(jnp.sum(top_counts)) / nnz < min_coverage:
            return _plain_tiled()
        head_ids = jnp.sort(top_idx).astype(jnp.int32)
        is_head = jnp.zeros((n,), bool).at[head_ids].set(True)
        mask = is_head[cols]
        n_head = int(jnp.sum(mask))          # host sync (staging only)
        n_tail = nnz - n_head
    else:
        head_ids = jnp.arange(n, dtype=jnp.int32)
        n_head, n_tail = nnz, 0
    tp = _stage_prof("head selection", tp)

    head_pos = jnp.zeros((n,), jnp.int32).at[head_ids].set(
        jnp.arange(p, dtype=jnp.int32))
    if n_tail:
        hidx = jnp.nonzero(mask, size=n_head)[0]
        hr, hc, hv = rows[hidx], cols[hidx], vals[hidx]
    else:
        hr, hc, hv = rows, cols, vals
    tp = _stage_prof("head gather", tp, hr, hc, hv)

    hp = head_pos[hc]
    d = build_head_block(hr, hp, hv, m_pad, p, dtype,
                         head_budget_gb=head_budget_gb,
                         int8_ok=int8_ok,
                         _max_flat_cells=_max_flat_cells
                         ).reshape(n_blocks, br, p)
    tp = _stage_prof("head block build", tp, d)

    if n_tail:
        tidx = jnp.nonzero(~mask, size=n_tail)[0]
        tr, tc, tv = rows[tidx], cols[tidx], vals[tidx]
        tp = _stage_prof("tail gather", tp, tr, tc, tv)
        row_side = _stage_tiled_side(tr, tc, tv, m, event_chunk, tile)
        tp = _stage_prof("tail row side", tp, row_side[0], row_side[1])
        corder = jnp.argsort(tc, stable=True)
        col_side = _stage_tiled_side(tc[corder], tr[corder], tv[corder],
                                     n, event_chunk, col_tile)
        tp = _stage_prof("tail col side", tp, col_side[0], col_side[1])
    else:
        row_side = col_side = None

    return MatmulOperator(shape=(m, n), mm_fn=_split_mm,
                          rmm_fn=_split_rmm,
                          operands=((d, head_ids), row_side, col_side),
                          dtype=dtype)


def dense_from_coo(idx: np.ndarray, val: np.ndarray,
                   shape: Tuple[int, ...],
                   dtype: jnp.dtype = jnp.float32) -> jax.Array:
    shape = tuple(int(s) for s in shape)
    if isinstance(idx, np.ndarray) and isinstance(val, np.ndarray):
        # densify on host: a flat bincount is orders of magnitude faster
        # than a device scatter over millions of events, and one bulk
        # transfer beats per-event device work.  bincount accumulates in
        # f64, so big targets are processed in leading-dim blocks to cap
        # the transient at ~512 MB instead of 2x the full dense size.
        total = int(np.prod(shape))
        max_f64_cells = 1 << 26
        if total <= max_f64_cells:
            flat = np.ravel_multi_index(
                tuple(idx[:, d] for d in range(idx.shape[1])), shape)
            out = np.bincount(flat, weights=val, minlength=total)
            return jnp.asarray(out.reshape(shape), dtype=dtype)

        out = np.zeros(shape, dtype=jnp.dtype(dtype))
        inner = total // shape[0]
        rows_per_block = max(1, max_f64_cells // inner)
        lead = idx[:, 0]
        inner_flat = np.ravel_multi_index(
            tuple(idx[:, d] for d in range(1, idx.shape[1])), shape[1:]) \
            if idx.shape[1] > 1 else np.zeros(len(idx), np.int64)
        for lo in range(0, shape[0], rows_per_block):
            hi = min(lo + rows_per_block, shape[0])
            sel = (lead >= lo) & (lead < hi)
            flat = (lead[sel] - lo) * inner + inner_flat[sel]
            block = np.bincount(flat, weights=val[sel],
                                minlength=(hi - lo) * inner)
            out[lo:hi] = block.reshape((hi - lo,) + shape[1:])
        return jnp.asarray(out)
    out = jnp.zeros(shape, dtype=dtype)
    return out.at[tuple(jnp.asarray(idx[:, d]) for d in
                        range(idx.shape[1]))].add(jnp.asarray(val, dtype))


# --------------------------------------------------------------------------
# padded per-row layout (seen lists, holdout lists)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PaddedRows:
    """Variable-length per-row integer lists padded to a rectangle.

    JAX needs static shapes; every per-user structure (seen items, holdout
    items, sampled candidates) is stored as ``(n_rows, width)`` index arrays
    plus a validity mask.  ``fill`` is a safe in-range index (0) so gathers
    never go out of bounds; consumers must honour ``mask``.
    """
    indices: np.ndarray   # int32 (n_rows, width)
    mask: np.ndarray      # bool  (n_rows, width)
    values: Optional[np.ndarray] = None  # aligned payload, same shape

    @property
    def shape(self):
        return self.indices.shape


def pad_rows(rows: np.ndarray, cols: np.ndarray,
             values: Optional[np.ndarray], n_rows: int,
             width: Optional[int] = None) -> PaddedRows:
    """Pack COO (row, col[, value]) into the padded-row layout.

    Requires ``rows`` sorted ascending (the data model sorts test data by
    user — reference relies on the same invariant, ``models.py:246``).
    """
    rows = np.asarray(rows)
    counts = np.bincount(rows, minlength=n_rows)
    max_len = int(counts.max()) if counts.size else 0
    width = width or max(max_len, 1)
    if max_len > width:
        raise ValueError(f"row length {max_len} exceeds width {width}")
    positions = np.arange(len(rows)) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
    indices = np.zeros((n_rows, width), dtype=np.int32)
    mask = np.zeros((n_rows, width), dtype=bool)
    indices[rows, positions] = cols
    mask[rows, positions] = True
    payload = None
    if values is not None:
        payload = np.zeros((n_rows, width), dtype=np.asarray(values).dtype)
        payload[rows, positions] = values
    return PaddedRows(indices=indices, mask=mask, values=payload)


# --------------------------------------------------------------------------
# batched inner products (sampled evaluation hot path)
# --------------------------------------------------------------------------

@jax.jit
def inner_product_at(u: jax.Array, v: jax.Array,
                     ui: jax.Array, vi: jax.Array) -> jax.Array:
    """``out[b, t] = u[ui[b, t]] . v[vi[b, t]]``.

    TPU formulation of the reference's ``guvectorize`` kernel
    (``polara/lib/sparse.py:58-72``): gathers factor rows and contracts the
    rank axis on the VPU in one fused pass.
    """
    return jnp.einsum("btk,btk->bt", u[ui], v[vi])


def inverse_permutation(p: np.ndarray) -> np.ndarray:
    """Inverse of a permutation vector (reference ``sparse.py:172-175``)."""
    p = np.asarray(p)
    out = np.empty_like(p)
    out[p] = np.arange(len(p))
    return out


def unfold_tensor_coordinates(index, shape, mode: int):
    """Mode-n unfolding of 3-tensor COO coordinates (reference
    ``sparse.py:178-187``): returns (row, col) indices of the unfolded
    matrix plus its shape.  ``index`` is (nnz, 3) or a 3-tuple of arrays.

    The device HOOI path never materializes unfoldings (see
    :mod:`polara_tpu.ops.hooi`); this helper serves host-side analysis
    and parity checks.
    """
    if isinstance(index, tuple):
        i0, i1, i2 = (np.asarray(x) for x in index)
    else:
        index = np.asarray(index)
        i0, i1, i2 = index[:, 0], index[:, 1], index[:, 2]
    modes = [(i0, shape[0]), (i1, shape[1]), (i2, shape[2])]
    row_idx, n_rows = modes[mode]
    (ia, na), (ib, nb) = [modes[m] for m in range(3) if m != mode]
    col_idx = ia + ib * na
    return (row_idx, col_idx), (n_rows, na * nb)
