"""Matrix-factorization training (SGD family).

Counterpart of the reference's Numba SGD sweeps
(``polara/lib/optimize.py:9-301``).  The reference updates factors one
interaction at a time — an inherently sequential loop that cannot map to a
systolic array.  The TPU-native formulation is shuffled **minibatch SGD**:
each step gathers the factor rows of a batch, computes all residuals on the
VPU, and scatter-adds per-row gradient sums (``segment_sum``), so every
step is a handful of fused gathers/matmuls.  Semantics preserved from the
reference:

* loss: squared error with per-occurrence L2 (``lambd``), optionally
  normalized by row/col nnz counts (``generalized_sgd_sweep``,
  optimize.py:123-154);
* optional kernel-smoothed regularization for KPMF
  (``sparse_kernel_update``, optimize.py:258-272): the regularizer pulls a
  row toward its graph-kernel-weighted neighborhood, with the reference's
  double-counted diagonal reproduced;
* per-epoch RMSE history and relative-improvement early stopping
  (optimize.py:185-217).

An epoch is one ``lax.scan`` over permuted, padded batches — a single
compiled program per (shape, batch) geometry.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax


class MFState(NamedTuple):
    p: jax.Array           # (n_rows, rank)
    q: jax.Array           # (n_cols, rank)
    opt_state: tuple


@dataclasses.dataclass
class MFResult:
    p: jax.Array
    q: jax.Array
    rmse_history: List[float]


def _rowwise_norm_optimizer(kind: str, lrate: float, gamma: float = 0.99,
                            smoothing: float = 1e-6
                            ) -> optax.GradientTransformation:
    """Per-row gradient-norm adjusters of the reference
    (``polara/lib/optimize.py:102-120``): adanorm (instant row-norm),
    gnprop (EMA of squared row norms), gnpropz (cumulative).  State rows
    only advance when the row received gradient this step — matching the
    per-sample semantics of the reference's SGD sweeps under batching."""

    def init(params):
        if kind == "adanorm":
            return ()
        return jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape[:-1], p.dtype), params)

    def update(grads, state, params=None):
        del params
        norms2 = jax.tree_util.tree_map(
            lambda g: jnp.sum(g * g, axis=-1), grads)
        if kind == "adanorm":
            denom = norms2
            new_state = state
        else:
            def advance(s, n2):
                touched = n2 > 0
                if kind == "gnprop":
                    stepped = gamma * s + (1.0 - gamma) * n2
                else:  # gnpropz
                    stepped = s + n2
                return jnp.where(touched, stepped, s)
            new_state = jax.tree_util.tree_map(advance, state, norms2)
            denom = new_state
        updates = jax.tree_util.tree_map(
            lambda g, d: -lrate * g / jnp.sqrt(smoothing + d)[..., None],
            grads, denom)
        return updates, new_state

    return optax.GradientTransformation(init, update)


def _make_optimizer(name: str, lrate: float) -> optax.GradientTransformation:
    if name == "sgd":
        return optax.sgd(lrate)
    if name == "adagrad":
        return optax.adagrad(lrate, eps=1e-6)
    if name == "rmsprop":
        return optax.rmsprop(lrate, decay=0.9, eps=1e-6)
    if name == "adam":
        return optax.adam(lrate, b1=0.9, b2=0.999, eps=1e-6)
    if name in ("adanorm", "gnprop", "gnpropz"):
        return _rowwise_norm_optimizer(name, lrate)
    raise ValueError(f"Unknown optimizer {name!r}; expected sgd/adagrad/"
                     "rmsprop/adam/adanorm/gnprop/gnpropz")


def _batch_grads(p, q, rows, cols, vals, weight, lambd,
                 row_inv_nnz, col_inv_nnz, row_kernel, col_kernel):
    """Gradient sums of one minibatch, scatter-added per factor row.

    ``weight`` zeroes padded entries.  Returns (grad_p, grad_q, sq_error).
    """
    pi = p[rows]
    qj = q[cols]
    err = (vals - jnp.sum(pi * qj, axis=1)) * weight

    # data-term gradients (d/dp of -err contribution)
    gp = -err[:, None] * qj
    gq = -err[:, None] * pi

    # regularization, per occurrence, scaled by 1/nnz when generalized
    if row_kernel is not None:
        reg_rows = row_kernel(p)[rows] + row_kernel.diag[rows, None] * pi
    else:
        reg_rows = pi
    if col_kernel is not None:
        reg_cols = col_kernel(q)[cols] + col_kernel.diag[cols, None] * qj
    else:
        reg_cols = qj
    gp = gp + (lambd * row_inv_nnz[rows] * weight)[:, None] * reg_rows
    gq = gq + (lambd * col_inv_nnz[cols] * weight)[:, None] * reg_cols

    grad_p = jax.ops.segment_sum(gp, rows, num_segments=p.shape[0])
    grad_q = jax.ops.segment_sum(gq, cols, num_segments=q.shape[0])
    return grad_p, grad_q, jnp.sum(err * err)


@dataclasses.dataclass(frozen=True)
class KernelOperator:
    """Dense symmetric kernel for KPMF regularization."""
    matrix: jax.Array        # (n, n)
    diag: jax.Array          # (n,)

    def __call__(self, factors: jax.Array) -> jax.Array:
        return self.matrix @ factors

    @classmethod
    def from_dense(cls, matrix: jax.Array) -> "KernelOperator":
        return cls(matrix=matrix, diag=jnp.diagonal(matrix))


def mf_train(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
             shape: Tuple[int, int], rank: int,
             lrate: float = 0.005, lambd: float = 0.5,
             num_epochs: int = 25, tol: float = 1e-4,
             batch_size: int = 8192,
             optimizer: str = "sgd",
             generalized: bool = False,
             row_nnz: Optional[np.ndarray] = None,
             col_nnz: Optional[np.ndarray] = None,
             row_kernel: Optional[KernelOperator] = None,
             col_kernel: Optional[KernelOperator] = None,
             seed: Optional[int] = None,
             dtype=jnp.float32,
             verbose: bool = False,
             iter_errors: Optional[List[float]] = None,
             iter_time: Optional[List[float]] = None) -> MFResult:
    """Train P, Q such that ``vals ~= sum(P[rows] * Q[cols])``."""
    import time as _time

    n_rows, n_cols = shape
    nnz = len(vals)
    n_batches = max(1, -(-nnz // batch_size))
    padded = n_batches * batch_size

    rows_d = jnp.asarray(np.resize(rows, padded), jnp.int32)
    cols_d = jnp.asarray(np.resize(cols, padded), jnp.int32)
    vals_d = jnp.asarray(np.resize(vals, padded), dtype)
    weight_d = jnp.asarray(
        (np.arange(padded) < nnz).astype(np.float32), dtype)

    if generalized:
        r_nnz = np.bincount(rows, minlength=n_rows) if row_nnz is None \
            else row_nnz
        c_nnz = np.bincount(cols, minlength=n_cols) if col_nnz is None \
            else col_nnz
        row_inv = jnp.asarray(1.0 / np.maximum(r_nnz, 1), dtype)
        col_inv = jnp.asarray(1.0 / np.maximum(c_nnz, 1), dtype)
    else:
        row_inv = jnp.ones((n_rows,), dtype)
        col_inv = jnp.ones((n_cols,), dtype)

    opt = _make_optimizer(optimizer, lrate)
    key = jax.random.key(0 if seed is None else seed)
    kp, kq, key = jax.random.split(key, 3)
    p0 = 0.1 * jax.random.normal(kp, (n_rows, rank), dtype)
    q0 = 0.1 * jax.random.normal(kq, (n_cols, rank), dtype)
    state = MFState(p=p0, q=q0, opt_state=opt.init((p0, q0)))

    @partial(jax.jit, donate_argnums=(0,))
    def run_epoch(state: MFState, epoch_key) -> Tuple[MFState, jax.Array]:
        perm = jax.random.permutation(epoch_key, padded)
        batches = (rows_d[perm].reshape(n_batches, batch_size),
                   cols_d[perm].reshape(n_batches, batch_size),
                   vals_d[perm].reshape(n_batches, batch_size),
                   weight_d[perm].reshape(n_batches, batch_size))

        def step(carry, batch):
            st = carry
            b_rows, b_cols, b_vals, b_w = batch
            gp, gq, sq_err = _batch_grads(
                st.p, st.q, b_rows, b_cols, b_vals, b_w, lambd,
                row_inv, col_inv, row_kernel, col_kernel)
            updates, opt_state = opt.update((gp, gq), st.opt_state,
                                            (st.p, st.q))
            p, q = optax.apply_updates((st.p, st.q), updates)
            return MFState(p, q, opt_state), sq_err

        state, sq_errors = jax.lax.scan(step, state, batches)
        return state, jnp.sum(sq_errors)

    rmse_history = [] if iter_errors is None else iter_errors
    last_err = np.finfo(np.float64).max
    for epoch in range(num_epochs):
        t0 = _time.perf_counter()
        key, epoch_key = jax.random.split(key)
        state, sq_err = run_epoch(state, epoch_key)
        sq_err = float(sq_err)
        if iter_time is not None:
            iter_time.append(_time.perf_counter() - t0)
        rmse = float(np.sqrt(sq_err / nnz))
        rmse_history.append(rmse)
        if verbose:
            print(f"Epoch: {epoch}. RMSE: {rmse}")
        improvement = abs(last_err - sq_err) / last_err
        last_err = sq_err
        if improvement < tol:
            break
    return MFResult(p=state.p, q=state.q, rmse_history=rmse_history)
