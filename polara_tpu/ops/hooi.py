"""Sparse third-order Tucker decomposition via HOOI.

Replaces the reference's Numba ttm kernels + ARPACK loop
(``polara/lib/tensor.py:37-96``, ``polara/lib/sparse.py:203-234``).

Key reformulation: the reference scatters a rank1 x rank2 outer product per
nonzero (``dttm_seq``: ``res[i0] += val * outer(u1[i1], u2[i2])``).  On TPU
we exploit that the feedback mode is tiny (a handful of rating levels):
one ``segment_sum`` over the joint (entity, feedback) key produces

    A[u, f, :] = sum over events (u, i, f) of val * U1[i, :]

and every mode's ttm unfolding is then a small einsum of ``A`` with the
feedback factor — no per-nonzero outer products, no scatter conflicts, and
the heavy contraction lands on the MXU.  Left singular vectors of the tall
unfoldings come from tall-skinny QR + SVD of the small R factor.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class HooiResult(NamedTuple):
    u0: jax.Array     # users   (n0, r0)
    u1: jax.Array     # items   (n1, r1)
    u2: jax.Array     # feedback (n2, r2)
    core: jax.Array   # (r0, r1, r2)
    growth_history: tuple


def _left_singular_vectors(m: jax.Array, k: int,
                           qr_method: str = "householder"
                           ) -> Tuple[jax.Array, jax.Array]:
    """Top-k left singular vectors of a tall-skinny matrix (QR + small
    SVD); returns (U_k, all singular values).  On TPU the panel QR runs
    as CholeskyQR2 (MXU matmuls instead of serialized Householder)."""
    if qr_method == "cholesky2":
        from polara_tpu.ops.rsvd import cholesky_qr2
        # relative jitter guards the Gram against rank-deficient
        # unfoldings (meaningful in f32, unlike an absolute epsilon)
        q, r = cholesky_qr2(m, eps=1e-6)
    else:
        q, r = jnp.linalg.qr(m)
    ur, s, _ = jnp.linalg.svd(r)
    return q @ ur[:, :k], s


def _entity_feedback_sums(seg_entity: jax.Array, fb: jax.Array,
                          val: jax.Array, factor_rows: jax.Array,
                          n_entity: int, n_fb: int,
                          axis_name: Optional[str] = None) -> jax.Array:
    """``A[e, f, :] = sum val * factor_rows`` grouped by (entity, feedback).
    One fused gather + segment_sum; the workhorse of every ttm.  With
    ``axis_name`` the events are sharded over that mesh axis and the
    partial sums psum into the replicated contraction."""
    joint = seg_entity * n_fb + fb
    flat = jax.ops.segment_sum(val[:, None] * factor_rows, joint,
                               num_segments=n_entity * n_fb)
    if axis_name is not None:
        flat = jax.lax.psum(flat, axis_name)
    return flat.reshape(n_entity, n_fb, factor_rows.shape[1])


@partial(jax.jit, static_argnames=("shape", "core_shape", "axis_name",
                                   "qr_method"))
def _hooi_sweep(i0, i1, i2, val, u0, u1, u2, shape, core_shape,
                axis_name: Optional[str] = None,
                qr_method: str = "householder"):
    n0, n1, n2 = shape
    r0, r1, r2 = core_shape

    # mode-0 update: unfold = A x2 u2, A[u,f,:] = sum val*u1[i1]
    a = _entity_feedback_sums(i0, i2, val, u1[i1], n0, n2, axis_name)
    m0 = jnp.einsum("ufa,fs->uas", a, u2).reshape(n0, -1)
    u0, _ = _left_singular_vectors(m0, r0, qr_method)

    # mode-1 update with the refreshed u0
    b = _entity_feedback_sums(i1, i2, val, u0[i0], n1, n2, axis_name)
    m1 = jnp.einsum("ifb,fs->ibs", b, u2).reshape(n1, -1)
    u1, _ = _left_singular_vectors(m1, r1, qr_method)

    # mode-2 update with refreshed u0, u1; also yields the core
    a2 = _entity_feedback_sums(i0, i2, val, u1[i1], n0, n2, axis_name)
    m2 = jnp.einsum("ufa,ub->fab", a2, u0).reshape(n2, -1)
    uu, s, _ = jnp.linalg.svd(m2, full_matrices=False)  # n2 is tiny
    u2 = uu[:, :r2]
    core_norm = jnp.linalg.norm(s[:r2])

    core = jnp.einsum("ua,ufb,fc->abc", u0, a2, u2)
    return u0, u1, u2, core, core_norm


def hooi(idx: np.ndarray, val: np.ndarray, shape: Tuple[int, int, int],
         core_shape: Tuple[int, int, int], num_iters: int = 25,
         growth_tol: float = 1e-4, seed: Optional[int] = None,
         dtype=jnp.float32, verbose: bool = False,
         qr_method: Optional[str] = None,
         dense_budget_bytes: Optional[int] = None,
         dense_tensor=None,
         init_factors: Optional[Tuple] = None) -> HooiResult:
    """HOOI with QR-random init and core-growth convergence
    (reference ``tensor.py:57-88``): stop when the relative growth of the
    core norm falls below ``growth_tol``.

    ``init_factors``: optional ``(u1, u2)`` orthonormal panels to warm-
    start the sweeps from (checkpoint resume, rank refinement, or
    cross-implementation parity runs) instead of the seeded random init.
    """
    if qr_method is None:
        from polara_tpu.ops.rsvd import default_qr_method
        qr_method = default_qr_method()
    n0, n1, n2 = (int(s) for s in shape)
    r0, r1, r2 = core_shape
    if not (r0 <= n0 and r1 <= n1 and r2 <= n2):
        raise ValueError(f"core shape {core_shape} exceeds tensor {shape}")

    if init_factors is not None:
        u1_init, u2_init = init_factors
        u1 = jnp.asarray(np.asarray(u1_init), dtype)
        u2 = jnp.asarray(np.asarray(u2_init), dtype)
        if u1.shape != (n1, r1) or u2.shape != (n2, r2):
            raise ValueError(f"init factors {u1.shape}/{u2.shape} do not "
                             f"match modes {(n1, r1)}/{(n2, r2)}")
    else:
        key = jax.random.key(0 if seed is None else seed)
        k1, k2 = jax.random.split(key)
        u1 = jnp.linalg.qr(jax.random.uniform(k1, (n1, r1), dtype))[0]
        u2 = jnp.linalg.qr(jax.random.uniform(k2, (n2, r2), dtype))[0]
    u0 = jnp.zeros((n0, r0), dtype)
    core = jnp.zeros(core_shape, dtype)

    def coo_device_arrays():
        return (jnp.asarray(idx[:, 0], jnp.int32),
                jnp.asarray(idx[:, 1], jnp.int32),
                jnp.asarray(idx[:, 2], jnp.int32),
                jnp.asarray(val, dtype))

    if verbose:
        # host-stepped loop so growth can be printed per sweep
        i0, i1, i2, vals = coo_device_arrays()
        norm_old = 0.0
        history = []
        for step in range(num_iters):
            u0, u1, u2, core, core_norm = _hooi_sweep(
                i0, i1, i2, vals, u0, u1, u2, (n0, n1, n2),
                (r0, r1, r2), qr_method=qr_method)
            norm_new = float(core_norm)
            growth = (norm_new - norm_old) / norm_new
            norm_old = norm_new
            history.append(growth)
            print(f"HOOI step {step + 1}: core growth {growth:.6f}")
            if growth < growth_tol:
                break
        return HooiResult(u0=u0, u1=u1, u2=u2, core=core,
                          growth_history=tuple(history))

    itemsize = jnp.dtype(dtype).itemsize
    use_dense = dense_tensor is not None or (
        dense_budget_bytes is not None
        and n0 * n1 * n2 * itemsize <= dense_budget_bytes)
    if use_dense:
        if dense_tensor is not None:
            d = dense_tensor
        else:
            from polara_tpu.ops.sparse import dense_from_coo
            d = dense_from_coo(np.asarray(idx),
                               np.asarray(val, np.float64),
                               (n0, n1, n2), dtype=dtype)
        u0, u1, u2, core, growths, n_steps = _hooi_until_dense(
            d, u0, u1, u2, (r0, r1, r2), num_iters,
            float(growth_tol), qr_method)
    else:
        i0, i1, i2, vals = coo_device_arrays()
        u0, u1, u2, core, growths, n_steps = _hooi_until(
            i0, i1, i2, vals, u0, u1, u2, (n0, n1, n2), (r0, r1, r2),
            num_iters, float(growth_tol), qr_method)
    history = tuple(np.asarray(growths)[: int(n_steps)].tolist())
    return HooiResult(u0=u0, u1=u1, u2=u2, core=core,
                      growth_history=history)


@partial(jax.jit, static_argnames=("shape", "core_shape", "num_iters",
                                   "qr_method"))
def _hooi_until(i0, i1, i2, vals, u0, u1, u2, shape, core_shape,
                num_iters: int, growth_tol: float,
                qr_method: str = "householder"):
    """Whole HOOI convergence loop on device (one dispatch instead of a
    host sync per sweep — the sweep itself is milliseconds on TPU, so
    tunnel/host latency dominated the reference-style loop)."""
    core0 = jnp.zeros(core_shape, u1.dtype)
    growths0 = jnp.full((num_iters,), jnp.nan, u1.dtype)

    def cond(carry):
        *_, step, done = carry
        return jnp.logical_and(~done, step < num_iters)

    def body(carry):
        u0, u1, u2, core, norm_old, growths, step, _ = carry
        u0, u1, u2, core, core_norm = _hooi_sweep.__wrapped__(
            i0, i1, i2, vals, u0, u1, u2, shape, core_shape,
            qr_method=qr_method)
        growth = (core_norm - norm_old) / core_norm
        growths = growths.at[step].set(growth)
        return (u0, u1, u2, core, core_norm, growths, step + 1,
                growth < growth_tol)

    init = (u0, u1, u2, core0, jnp.asarray(0.0, u1.dtype), growths0,
            jnp.asarray(0), jnp.asarray(False))
    u0, u1, u2, core, _, growths, n_steps, _ = jax.lax.while_loop(
        cond, body, init)
    return u0, u1, u2, core, growths, n_steps


def round_core(core: np.ndarray, mode: int, rank: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Truncate one mode of the Tucker core via SVD of its unfolding
    (reference ``models.py:970-980``) — evaluates smaller mlranks without
    re-running HOOI.  Returns (rotation, new_core); the mode's factor is
    updated as ``factor @ rotation``.  Host-side numpy: the core is tiny.
    """
    core = np.asarray(core)
    lead = [mode] + [m for m in range(core.ndim) if m != mode]
    flat = core.transpose(lead).reshape(core.shape[mode], -1, order="F")
    u, s, vt = np.linalg.svd(flat, full_matrices=False)
    rotation = u[:, :rank]
    rest_dims = [core.shape[m] for m in lead[1:]]
    inverse = np.argsort(lead)
    new_core = (s[:rank, None] * vt[:rank])\
        .reshape([rank] + rest_dims, order="F").transpose(inverse)
    return rotation, np.ascontiguousarray(new_core)


def flatten_feedback_weights(w, flattener) -> np.ndarray:
    """Collapse the feedback factor into a rank-r2 weighting vector used by
    the scoring path (reference ``flatten_scores``, ``models.py:983-1006``,
    applied to ``w.T`` at ``models.py:1052``).

    The flattener decides how predicted scores across rating levels merge
    into one relevance score per item (the polarity trick: summing over all
    levels weights items by how confidently the model puts them in *high*
    ratings).
    """
    wt = np.asarray(w).T               # (r2, n_fb)
    if flattener is None:
        flattener = slice(None)
    if isinstance(flattener, str):
        return getattr(np, flattener)(wt, axis=-1)
    if isinstance(flattener, (int, np.integer)):
        return wt[..., flattener]
    if isinstance(flattener, (list, slice)):
        return wt[..., flattener].sum(axis=-1)
    if isinstance(flattener, tuple):
        slicer, method = flattener
        slicer = slice(None) if slicer is None else slicer
        return getattr(np, method)(wt[..., slicer], axis=-1)
    if callable(flattener):
        return np.asarray(flattener(wt))
    raise ValueError("Unrecognized flattener value")


def tucker_als(idx, val, shape, mlrank, *args, **kwargs):
    """Legacy alias for :func:`hooi` (reference keeps a duplicate
    implementation in ``polara/lib/hosvd.py:27-89``; here it is the same
    device solver)."""
    return hooi(idx, val, shape, mlrank, *args, **kwargs)


# --------------------------------------------------------------------------
# Dense-tensor path: when n0*n1*n2 fits HBM, the ttm contractions become
# plain MXU einsums over the dense (users, items, levels) block — no
# per-event segment scatters at all.
# --------------------------------------------------------------------------

def _dense_sweep(d, u0, u1, u2, core_shape, qr_method):
    r0, r1, r2 = core_shape
    n0, n1, n2 = d.shape

    a = jnp.einsum("uif,ir->ufr", d, u1)                  # (n0, f, r1)
    m0 = jnp.einsum("ufa,fs->uas", a, u2).reshape(n0, -1)
    u0, _ = _left_singular_vectors(m0, r0, qr_method)

    b = jnp.einsum("uif,ur->ifr", d, u0)                  # (n1, f, r0)
    m1 = jnp.einsum("ifb,fs->ibs", b, u2).reshape(n1, -1)
    u1, _ = _left_singular_vectors(m1, r1, qr_method)

    a2 = jnp.einsum("uif,ir->ufr", d, u1)
    m2 = jnp.einsum("ufa,ub->fab", a2, u0).reshape(n2, -1)
    uu, s, _ = jnp.linalg.svd(m2, full_matrices=False)
    u2 = uu[:, :r2]
    core_norm = jnp.linalg.norm(s[:r2])
    core = jnp.einsum("ua,ufb,fc->abc", u0, a2, u2)
    return u0, u1, u2, core, core_norm


@partial(jax.jit, static_argnames=("core_shape", "num_iters", "qr_method"))
def _hooi_until_dense(d, u0, u1, u2, core_shape, num_iters: int,
                      growth_tol: float, qr_method: str):
    core0 = jnp.zeros(core_shape, u1.dtype)
    growths0 = jnp.full((num_iters,), jnp.nan, u1.dtype)

    def cond(carry):
        *_, step, done = carry
        return jnp.logical_and(~done, step < num_iters)

    def body(carry):
        u0, u1, u2, core, norm_old, growths, step, _ = carry
        u0, u1, u2, core, core_norm = _dense_sweep(d, u0, u1, u2,
                                                   core_shape, qr_method)
        growth = (core_norm - norm_old) / core_norm
        growths = growths.at[step].set(growth)
        return (u0, u1, u2, core, core_norm, growths, step + 1,
                growth < growth_tol)

    init = (u0, u1, u2, core0, jnp.asarray(0.0, u1.dtype), growths0,
            jnp.asarray(0), jnp.asarray(False))
    u0, u1, u2, core, _, growths, n_steps, _ = jax.lax.while_loop(
        cond, body, init)
    return u0, u1, u2, core, growths, n_steps
