"""Exclusion sampling: random unseen items per user.

Reference: the Numba incremental Fisher-Yates samplers
(``polara/lib/sampler.py:11-132``) — inherently sequential typed-dict
bookkeeping.  The TPU-native formulation uses the random-keys trick the
reference itself applies in ``preprocessing/matrices.py:62-68``: draw one
uniform key per catalog item, push excluded items to -inf, take the top-k
keys.  That is an exact uniform sample without replacement, vectorized over
all users as one masked top-k on device.

``split_top_continuous`` (``sampler.py:135-165``) is a host-side data-prep
utility and stays numpy.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_rows", "n_cols", "n_samples"))
def _sample_excluded(key, seen_rows, seen_cols, seen_valid,
                     n_rows: int, n_cols: int, n_samples: int) -> jax.Array:
    keys = jax.random.uniform(key, (n_rows, n_cols))
    keys = keys.at[seen_rows, seen_cols].min(
        jnp.where(seen_valid, -jnp.inf, jnp.inf))
    _, sampled = jax.lax.top_k(keys, n_samples)
    return sampled.astype(jnp.int32)


def sample_row_wise(seen_rows: np.ndarray, seen_cols: np.ndarray,
                    n_rows: int, n_cols: int, n_samples: int,
                    seed: Optional[int] = None,
                    chunk_rows: int = 8192) -> np.ndarray:
    """For every row, sample ``n_samples`` column indices not present in
    that row (uniform without replacement).  Guarantees exclusion as long
    as every row has at least ``n_samples`` unseen columns."""
    counts = np.bincount(seen_rows, minlength=n_rows)
    if (n_cols - counts).min() < n_samples:
        raise ValueError("some rows have fewer unseen columns than "
                         "requested samples")
    key = jax.random.key(0 if seed is None else seed)
    out = np.empty((n_rows, n_samples), dtype=np.int32)
    order = np.argsort(seen_rows, kind="stable")
    seen_rows = np.asarray(seen_rows)[order]
    seen_cols = np.asarray(seen_cols)[order]
    bounds = np.searchsorted(seen_rows, np.arange(0, n_rows + chunk_rows,
                                                  chunk_rows))
    width = max(1, int(max(bounds[i + 1] - bounds[i]
                           for i in range(len(bounds) - 1))))
    for c, start in enumerate(range(0, n_rows, chunk_rows)):
        stop = min(start + chunk_rows, n_rows)
        lo, hi = bounds[c], bounds[c + 1]
        rows = np.zeros(width, np.int32)
        cols = np.zeros(width, np.int32)
        valid = np.zeros(width, bool)
        rows[:hi - lo] = seen_rows[lo:hi] - start
        cols[:hi - lo] = seen_cols[lo:hi]
        valid[:hi - lo] = True
        chunk_key = jax.random.fold_in(key, c)
        sampled = _sample_excluded(chunk_key, jnp.asarray(rows),
                                   jnp.asarray(cols), jnp.asarray(valid),
                                   chunk_rows, n_cols, n_samples)
        out[start:stop] = np.asarray(sampled)[: stop - start]
    return out


@partial(jax.jit, static_argnames=("n_samples",))
def sampled_scores(user_factors: jax.Array, item_factors: jax.Array,
                   seen_rows: jax.Array, seen_cols: jax.Array,
                   seen_valid: jax.Array, key, n_samples: int) -> jax.Array:
    """Fused analogue of ``mf_random_item_scoring``
    (``polara/lib/sampler.py:73-93``): sample unseen items per user and
    score them in one pass; returns (n_users, n_samples) scores."""
    n_users = user_factors.shape[0]
    n_items = item_factors.shape[0]
    sampled = _sample_excluded(key, seen_rows, seen_cols, seen_valid,
                               n_users, n_items, n_samples)
    return jnp.einsum("uk,unk->un", user_factors, item_factors[sampled])


def split_top_continuous(tasks: np.ndarray, priorities: np.ndarray
                         ) -> Tuple[List[int], List[int], List[int]]:
    """Pick, per task, its highest-priority instance, but flag instances
    that interrupt a contiguous top block (reference
    ``sampler.py:135-165``) — used to avoid "recommendations from the
    future" in temporal splits.

    Walk instances in descending priority; the first occurrence of each
    task joins the top sequence, later occurrences above the global cutoff
    displace the earlier pick into the non-sequential set.  Large inputs
    route through the native C++ kernel (:mod:`polara_tpu.native`).
    """
    tasks = np.asarray(tasks)
    if len(tasks) >= 10_000:
        from polara_tpu import native
        if native.native_available():
            return native.split_top_continuous(
                tasks, np.asarray(priorities, dtype=np.float64))
    order = np.argsort(-np.asarray(priorities), kind="stable")
    top_of: dict = {}
    nonseq_idx: List[int] = []
    remaining = set(tasks.tolist())
    consumed = 0
    for idx in order:
        consumed += 1
        task = tasks[idx]
        if task in top_of:
            nonseq_idx.append(top_of[task])
        else:
            remaining.discard(task)
        top_of[task] = int(idx)
        if not remaining:
            break
    topseq_idx = list(top_of.values())
    lowseq_idx = [int(i) for i in order[consumed:]]
    return topseq_idx, lowseq_idx, nonseq_idx
