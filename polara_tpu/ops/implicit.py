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
