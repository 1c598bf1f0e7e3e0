"""Non-personalized and neighborhood baselines.

Reference: ``polara/recommender/models.py:607-725``.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from polara_tpu.models.base import RecommenderModel
from polara_tpu.ops.scoring import TestChunk
from polara_tpu.runtime.timing import track_time


class PopularityModel(RecommenderModel):
    """'MP': item interaction counts (or feedback sums) broadcast to every
    user (reference ``models.py:649-668``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.method = "MP"
        self.by_feedback_value = False

    def build(self):
        itemid = self.data.fields.itemid
        groups = self.data.training.groupby(itemid, sort=True)
        if self.by_feedback_value:
            feedback = self.data.fields.feedback
            scores = groups[feedback].sum().values
        else:
            scores = groups.size().values
        self.item_scores = jnp.asarray(scores, self.compute_dtype)

    def score_params(self) -> dict:
        return {"item_scores": self.item_scores}

    @staticmethod
    def score_chunk(params: dict, chunk: TestChunk) -> jax.Array:
        scores = params["item_scores"]
        return jnp.broadcast_to(scores[None, :],
                                (chunk.users.shape[0], scores.shape[0]))


class RandomModel(RecommenderModel):
    """'RND': uniform random scores, deterministic per (seed, chunk)
    (reference ``models.py:671-690``)."""

    def __init__(self, *args, **kwargs):
        self.seed = kwargs.pop("seed", None)
        super().__init__(*args, **kwargs)
        self.method = "RND"

    def build(self):
        self.data.update()
        item_index = self.data.get_entity_index(self.data.fields.itemid)
        self.n_items = item_index.shape[0]
        self._seed_value = 0 if self.seed is None else int(self.seed)

    def score_params(self) -> dict:
        return {"seed": jnp.uint32(self._seed_value),
                "catalog": jnp.zeros((self.n_items,), self.compute_dtype)}

    @staticmethod
    def score_chunk(params: dict, chunk: TestChunk) -> jax.Array:
        key = jax.random.fold_in(jax.random.key(params["seed"]), chunk.start)
        n_items = params["catalog"].shape[0]
        return jax.random.uniform(
            key, (chunk.users.shape[0], n_items),
            dtype=params["catalog"].dtype)


class CooccurrenceModel(RecommenderModel):
    """'item-to-item': scores via the co-occurrence matrix ``RᵀR`` with the
    diagonal zeroed (reference ``models.py:693-725``).

    The i2i matrix is materialized dense in HBM: item catalogs at
    recommender scale give an (n_items × n_items) block that XLA multiplies
    on the MXU far faster than sparse bookkeeping.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.method = "item-to-item"
        self.implicit = False

    def build(self):
        coo = self.get_training_matrix()
        vals = jnp.sign(coo.vals) if self.implicit else coo.vals
        with track_time(self.training_time, verbose=self.verbose,
                        model=self.method):
            self._i2i_matrix = _build_i2i(coo.rows, coo.cols, vals,
                                          coo.shape)
            self._i2i_matrix.block_until_ready()

    def score_params(self) -> dict:
        return {"i2i": self._i2i_matrix,
                "implicit": jnp.asarray(self.implicit)}

    @staticmethod
    def score_chunk(params: dict, chunk: TestChunk) -> jax.Array:
        i2i = params["i2i"]
        n_items = i2i.shape[0]
        vals = jnp.where(params["implicit"], jnp.sign(chunk.vals),
                         chunk.vals).astype(i2i.dtype)
        profile = jnp.zeros((chunk.users.shape[0], n_items), i2i.dtype)
        profile = profile.at[chunk.rows, chunk.cols].add(
            jnp.where(chunk.valid, vals, 0.0))
        return profile @ i2i


from functools import partial


@partial(jax.jit, static_argnames=("shape",))
def _build_i2i(rows, cols, vals, shape):
    dense = jnp.zeros(shape, vals.dtype).at[rows, cols].add(vals)
    i2i = dense.T @ dense
    return i2i - jnp.diag(jnp.diagonal(i2i))


class NonPersonalized(RecommenderModel):
    """Deprecated most-popular / random / top-score model
    (reference ``models.py:607-646``) — kept for API parity; use
    :class:`PopularityModel` or :class:`RandomModel` instead."""

    def __init__(self, kind, *args, **kwargs):
        import warnings
        warnings.warn("This is a deprecated method. Use either "
                      "PopularityModel or RandomModel instead.",
                      DeprecationWarning)
        self.seed = kwargs.pop("seed", None)
        super().__init__(*args, **kwargs)
        self.method = kind

    def build(self):
        itemid = self.data.fields.itemid
        feedback = self.data.fields.feedback
        groups = self.data.training.groupby(itemid, sort=True)
        if self.method == "mostpopular":
            self.item_scores = jnp.asarray(groups.size().values,
                                           self.compute_dtype)
        elif self.method == "topscore":
            self.item_scores = jnp.asarray(groups[feedback].sum().values,
                                           self.compute_dtype)
        elif self.method == "random":
            n_items = self.data.get_entity_index(itemid).shape[0]
            self.item_scores = jnp.zeros((n_items,), self.compute_dtype)
        else:
            raise NotImplementedError(self.method)

    def score_params(self) -> dict:
        return {"item_scores": self.item_scores,
                "randomized": jnp.asarray(self.method == "random"),
                "seed": jnp.uint32(0 if self.seed is None else self.seed)}

    @staticmethod
    def score_chunk(params: dict, chunk: TestChunk) -> jax.Array:
        scores = params["item_scores"]
        shape = (chunk.users.shape[0], scores.shape[0])
        key = jax.random.fold_in(jax.random.key(params["seed"]),
                                 chunk.start)
        random_scores = jax.random.uniform(key, shape, scores.dtype)
        return jnp.where(params["randomized"], random_scores,
                         jnp.broadcast_to(scores[None, :], shape))
