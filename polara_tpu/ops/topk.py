"""Seen-item masking and top-k selection.

Fuses the reference's ``downvote_seen_items`` + ``get_topk_elements`` pair
(``polara/recommender/models.py:494-564``) into one jitted device pass:
XLA folds the scatter and the top-k into the score producer, so the dense
score block never round-trips to the host.  (A Pallas fused
score+mask+top-k kernel plugs in behind the same API — see
``polara_tpu.ops.pallas``.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

PAD_CONST = -1  # emitted for positions beyond the catalog (parity with
                # reference ``_pad_const``, models.py:73)


def downvote_items(scores: jax.Array, rows: jax.Array, cols: jax.Array,
                   valid: jax.Array) -> jax.Array:
    """Push the listed (row, col) scores below the block minimum.

    Implements the reference's shift formula (``models.py:510-519``):
    ``lowered = min(scores) - (max(seen) - seen) - 1`` — seen items keep
    their relative order but always rank after every unseen item, which
    matters when k exceeds the number of unseen items.

    ``valid`` masks padding entries; the scatter uses ``min`` with +inf on
    padded slots so they are no-ops even when their (0, 0) fill collides
    with a real entry.
    """
    seen_vals = scores[rows, cols]
    neg_inf = jnp.asarray(jnp.inf, scores.dtype)
    masked_vals = jnp.where(valid, seen_vals, -jnp.inf)
    seen_max = jnp.max(masked_vals)
    block_min = jnp.min(scores)
    lowered = block_min - (seen_max - seen_vals) - 1
    update = jnp.where(valid, lowered, neg_inf)
    return scores.at[rows, cols].min(update)


def top_k_indices(scores: jax.Array, k: int,
                  n_valid_cols: int | None = None) -> jax.Array:
    """Indices of the k largest entries per row, ties to the lowest index.

    ``n_valid_cols`` masks out padded catalog columns.  When k exceeds the
    catalog size, trailing positions are PAD_CONST (reference pads short
    recommendation lists the same way, ``models.py:536-540``).
    """
    n_cols = scores.shape[-1]
    if n_valid_cols is not None and n_valid_cols < n_cols:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape,
                                           scores.ndim - 1)
        scores = jnp.where(col_ids < n_valid_cols, scores, -jnp.inf)
    limit = n_valid_cols if n_valid_cols is not None else n_cols
    if k <= limit:
        _, idx = jax.lax.top_k(scores, k)
        return idx.astype(jnp.int32)
    _, idx = jax.lax.top_k(scores, limit)
    pad = jnp.full(scores.shape[:-1] + (k - limit,), PAD_CONST,
                   dtype=jnp.int32)
    return jnp.concatenate([idx.astype(jnp.int32), pad], axis=-1)


@partial(jax.jit, static_argnames=("k", "filter_seen", "n_valid_cols"))
def mask_and_topk(scores: jax.Array, rows: jax.Array, cols: jax.Array,
                  valid: jax.Array, k: int, filter_seen: bool = True,
                  n_valid_cols: int | None = None) -> jax.Array:
    if filter_seen:
        scores = downvote_items(scores, rows, cols, valid)
    return top_k_indices(scores, k, n_valid_cols)
