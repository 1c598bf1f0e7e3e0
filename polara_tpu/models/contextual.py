"""Contextual post-filtering model mixin.

Reference: ``polara/recommender/contextual/models.py:4-32``.  The
reference mutates score slices in numpy between scoring and top-k; here
the boost is part of the jitted score step — a masked scatter-max fused
by XLA into the score→top-k pass, so post-filtering costs one gather and
one scatter on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from polara_tpu.ops.scoring import TestChunk


class ItemPostFilteringMixin:
    """Boost the scores of items matching each test user's holdout context
    above the global maximum, preserving their relative order (reference
    formula ``upscored = scores.max() + context_scores + 1``)."""

    # the boost rewrites dense scores — the factor-decomposed fused
    # backend cannot express it, so force the XLA path
    proj_chunk = None

    def score_params(self) -> dict:
        params = dict(super().score_params())
        items, valid = self.data.upvote_arrays()
        params["upvote_items"] = jnp.asarray(items)
        params["upvote_valid"] = jnp.asarray(valid)
        return params

    @classmethod
    def score_chunk(cls, params: dict, chunk: TestChunk) -> jax.Array:
        scores = super(ItemPostFilteringMixin, cls).score_chunk(params,
                                                               chunk)
        upvote = params["upvote_items"][chunk.users]            # (cu, m)
        valid = (params["upvote_valid"][chunk.users]
                 & chunk.user_valid[:, None])
        rows = jnp.broadcast_to(
            jnp.arange(upvote.shape[0])[:, None], upvote.shape)
        current = scores[rows, upvote]
        boosted = scores.max() + current.astype(scores.dtype) + 1
        update = jnp.where(valid, boosted,
                           jnp.asarray(-jnp.inf, scores.dtype))
        return scores.at[rows, jnp.where(valid, upvote, 0)].max(update)
