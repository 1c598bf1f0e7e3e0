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
    elif callable(weight):
        transformed = weight(scaled)
    else:
        raise ValueError(f"Unknown confidence weight {weight!r}")
    return jnp.where(values > 0, alpha * transformed, 0.0)


class ImplicitFactors(NamedTuple):
    user: jax.Array
    item: jax.Array


@partial(jax.jit, static_argnames=("batch_rows",))
def ials_half_sweep(cm1: jax.Array, other: jax.Array, reg: float,
                    batch_rows: int = 64) -> jax.Array:
    """Solve for one side's factors given the other side.

    ``cm1`` is the dense (rows × cols) confidence margin ``C - 1`` (zero
    where unobserved); ``other`` the (cols × k) fixed factors.  Rows are
    processed in padded batches through ``lax.map`` so the peak
    intermediate is (batch, cols, k).
    """
    n_rows, n_cols = cm1.shape
    k = other.shape[1]
    gram = other.T @ other + reg * jnp.eye(k, dtype=other.dtype)

    n_batches = -(-n_rows // batch_rows)
    pad = n_batches * batch_rows - n_rows
    cm1 = jnp.pad(cm1, ((0, pad), (0, 0)))
    cm1 = cm1.reshape(n_batches, batch_rows, n_cols)

    def solve_batch(cm1_b):
        pref = cm1_b > 0
        # rhs = Yᵀ (c ⊙ p) with c = cm1 + 1 on observed entries
        rhs = jnp.where(pref, cm1_b + 1.0, 0.0) @ other        # (b, k)
        weighted = cm1_b[:, :, None] * other[None, :, :]        # (b, n, k)
        a = gram[None] + jnp.einsum("bik,il->bkl", weighted, other)
        chol = jax.scipy.linalg.cho_factor(a)
        return jax.scipy.linalg.cho_solve(chol, rhs[..., None])[..., 0]

    x = jax.lax.map(solve_batch, cm1)
    return x.reshape(n_batches * batch_rows, k)[:n_rows]


def ials_train(dense_ratings: jax.Array, rank: int, alpha: float = 1.0,
               weight: WeightFn = "log2", epsilon: float = 1.0,
               reg: float = 0.01, num_epochs: int = 15,
               seed: Optional[int] = 0, batch_rows: int = 64,
               dtype=jnp.float32) -> ImplicitFactors:
    """Alternating sweeps over users and items on the dense HBM-resident
    ratings block."""
    cm1 = confidence(dense_ratings.astype(dtype), alpha, weight, epsilon)
    n_users, n_items = cm1.shape
    key = jax.random.key(0 if seed is None else seed)
    item_factors = (jax.random.normal(key, (n_items, rank), dtype)
                    * (1.0 / math.sqrt(rank)))
    user_factors = jnp.zeros((n_users, rank), dtype)

    user_factors, item_factors = _ials_epochs(
        cm1, user_factors, item_factors, reg, num_epochs, batch_rows)
    return ImplicitFactors(user=user_factors, item=item_factors)


@partial(jax.jit, static_argnames=("num_epochs", "batch_rows"))
def _ials_epochs(cm1, user_factors, item_factors, reg, num_epochs: int,
                 batch_rows: int):
    """All alternating sweeps in one device program (a host dispatch per
    half-sweep costs more than the sweep itself on TPU)."""
    cm1_t = cm1.T

    def epoch(_, carry):
        user_factors, item_factors = carry
        user_factors = ials_half_sweep.__wrapped__(cm1, item_factors, reg,
                                                   batch_rows)
        item_factors = ials_half_sweep.__wrapped__(cm1_t, user_factors,
                                                   reg, batch_rows)
        return user_factors, item_factors

    return jax.lax.fori_loop(0, num_epochs, epoch,
                             (user_factors, item_factors))


def ials_fold_in(profiles: jax.Array, item_factors: jax.Array,
                 alpha: float = 1.0, weight: WeightFn = "log2",
                 epsilon: float = 1.0, reg: float = 0.01,
                 batch_rows: int = 64) -> jax.Array:
    """Warm-start user vectors from raw test profiles in one batched
    solve (replaces the reference's per-user ``recalculate_user`` loop)."""
    cm1 = confidence(profiles.astype(item_factors.dtype), alpha, weight,
                     epsilon)
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
