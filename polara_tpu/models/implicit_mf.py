"""Implicit-feedback models: iALS and BPR, trained natively on device.

API parity with the reference's ``implicit``-library wrappers
(``polara/recommender/external/implicit/ialswrapper.py:13-91``,
``bprwrapper.py:7-76``) — same config surface (rank, alpha/epsilon/
weight_func, regularization, num_epochs) and the same warm-start
folding-in semantics — but the compute is JAX/XLA
(:mod:`polara_tpu.ops.implicit`) instead of a CPU extension.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from polara_tpu.models.base import RecommenderModel, EmbeddingsMixin
from polara_tpu.models.mf import ProbabilisticMF
from polara_tpu.ops.implicit import (bpr_train, ials_fold_in, ials_train)
from polara_tpu.ops.topk import mask_and_topk
from polara_tpu.runtime.timing import track_time


class _RankedFactorModel(EmbeddingsMixin, RecommenderModel):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._rank = 10
        self.factors: dict = {}

    @property
    def rank(self) -> int:
        return self._rank

    @rank.setter
    def rank(self, new_value: int):
        if new_value != self._rank:
            self._rank = new_value
            self._is_ready = False
            self._recommendations = None

    def score_params(self) -> dict:
        return {"user_factors": self.factors[self.data.fields.userid],
                "item_factors": self.factors[self.data.fields.itemid],
                "item_panel": self.factors[self.data.fields.itemid]}

    # known-user scoring: factor lookup, same compiled step as PMF
    score_chunk = staticmethod(ProbabilisticMF.score_chunk)
    proj_chunk = staticmethod(ProbabilisticMF.proj_chunk)

    def _warm_start_profiles(self):
        (user_rows, item_idx, feedback), test_shape, _ = \
            self._get_test_data()
        profiles = np.zeros(test_shape)
        profiles[user_rows, item_idx] = feedback
        return (jnp.asarray(profiles, self.compute_dtype),
                jnp.asarray(user_rows, jnp.int32),
                jnp.asarray(item_idx, jnp.int32))

    def _fold_in_users(self, profiles: jax.Array) -> jax.Array:
        raise NotImplementedError

    def get_recommendations(self):
        if not self.data.warm_start:
            return super().get_recommendations()
        if not self.filter_seen:
            raise ValueError("The model always filters seen items from "
                             "results.")
        profiles, seen_rows, seen_cols = self._warm_start_profiles()
        user_factors = self._fold_in_users(profiles)
        scores = user_factors @ self.factors[self.data.fields.itemid].T
        recs = mask_and_topk(scores, seen_rows, seen_cols,
                             jnp.ones(seen_rows.shape[0], bool),
                             self.topk, filter_seen=True,
                             n_valid_cols=scores.shape[1])
        return np.asarray(recs)


class ImplicitALS(_RankedFactorModel):
    """'iALS': confidence-weighted alternating least squares."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.alpha = 1.0
        self.epsilon = 1.0
        self.weight_func = "log2"
        self.regularization = 0.01
        self.num_epochs = 15
        # None = auto-size per sweep axis to the HBM budget (bigger
        # batches cut the sequential solve count ~7x at ML-10M); set an
        # int to pin both sweeps' batch size
        self.batch_rows: Optional[int] = None
        # streaming (beyond-HBM) tier knob: entities solved per window
        # of the tile-aligned event sweeps; None = ops default (4096)
        self.batch_entities: Optional[int] = None
        self.seed = 0
        self.method = "iALS"

    def build(self):
        mesh = self.active_mesh
        # beyond the HBM budget the dense ratings block cannot exist —
        # route to the streaming tile-aligned event sweeps (same math,
        # see ops.implicit.ials_train_events)
        from polara_tpu import config as defaults
        coo = self.get_training_matrix()
        budget = defaults.get_default("hbm_score_budget_gb") * 2**30
        if mesh is not None:
            budget *= mesh.devices.size
        dense_bytes = (coo.shape[0] * coo.shape[1]
                       * jnp.dtype(self.compute_dtype).itemsize)
        if dense_bytes > budget:
            stream_kw = {} if self.batch_entities is None else \
                {"batch_entities": self.batch_entities}
            with track_time(self.training_time, verbose=self.verbose,
                            model=self.method):
                if mesh is not None and mesh.devices.size > 1:
                    from polara_tpu.parallel.distributed import \
                        distributed_ials_events
                    result = jax.block_until_ready(distributed_ials_events(
                        coo.rows, coo.cols, coo.vals, coo.shape, self.rank,
                        mesh, alpha=self.alpha, weight=self.weight_func,
                        epsilon=self.epsilon, reg=self.regularization,
                        num_epochs=self.num_epochs, seed=self.seed,
                        dtype=self.compute_dtype, **stream_kw))
                else:
                    from polara_tpu.ops.implicit import ials_train_events
                    result = jax.block_until_ready(ials_train_events(
                        coo.rows, coo.cols, coo.vals, coo.shape, self.rank,
                        alpha=self.alpha, weight=self.weight_func,
                        epsilon=self.epsilon, reg=self.regularization,
                        num_epochs=self.num_epochs, seed=self.seed,
                        dtype=self.compute_dtype, **stream_kw))
            self.factors[self.data.fields.userid] = result.user
            self.factors[self.data.fields.itemid] = result.item
            return
        dense = self.get_training_matrix(dense=True)
        with track_time(self.training_time, verbose=self.verbose,
                        model=self.method):
            if mesh is not None:
                from polara_tpu.parallel.distributed import distributed_ials
                result = distributed_ials(
                    dense, self.rank, mesh, alpha=self.alpha,
                    weight=self.weight_func, epsilon=self.epsilon,
                    reg=self.regularization, num_epochs=self.num_epochs,
                    seed=self.seed, batch_rows=self.batch_rows,
                    dtype=self.compute_dtype)
            else:
                result = ials_train(
                    dense, self.rank, alpha=self.alpha,
                    weight=self.weight_func, epsilon=self.epsilon,
                    reg=self.regularization, num_epochs=self.num_epochs,
                    seed=self.seed, batch_rows=self.batch_rows,
                    dtype=self.compute_dtype)
            jax.block_until_ready(result)
        self.factors[self.data.fields.userid] = result.user
        self.factors[self.data.fields.itemid] = result.item

    def _fold_in_users(self, profiles: jax.Array) -> jax.Array:
        return ials_fold_in(profiles,
                            self.factors[self.data.fields.itemid],
                            alpha=self.alpha, weight=self.weight_func,
                            epsilon=self.epsilon, reg=self.regularization,
                            batch_rows=self.batch_rows)


@jax.jit
def _lstsq_fold_in(profiles: jax.Array, item_factors: jax.Array,
                   reg: float) -> jax.Array:
    """Ridge fold-in onto fixed item factors over each user's seen set."""
    y = item_factors
    p = (profiles > 0).astype(y.dtype)
    a = jnp.einsum("bi,ik,il->bkl", p, y, y) \
        + reg * jnp.eye(y.shape[1], dtype=y.dtype)[None]
    rhs = p @ y
    chol = jax.scipy.linalg.cho_factor(a)
    return jax.scipy.linalg.cho_solve(chol, rhs[..., None])[..., 0]


class ImplicitBPR(_RankedFactorModel):
    """'BPRMF': Bayesian personalized ranking."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.learning_rate = 0.01
        self.regularization = 0.01
        self.num_epochs = 100
        self.batch_size = 1024
        self.seed = 0
        self.show_progress = False
        self.epoch_stats: Optional[list] = None
        self.method = "BPRMF"

    def build(self):
        coo = self.get_training_matrix()
        self.epoch_stats = []
        mesh = self.active_mesh
        with track_time(self.training_time, verbose=self.verbose,
                        model=self.method):
            if mesh is not None:
                from polara_tpu.parallel.distributed import distributed_bpr
                result = distributed_bpr(
                    np.asarray(coo.rows), np.asarray(coo.cols), coo.shape,
                    self.rank, mesh, learning_rate=self.learning_rate,
                    reg=self.regularization, num_epochs=self.num_epochs,
                    batch_size=self.batch_size, seed=self.seed,
                    dtype=self.compute_dtype,
                    epoch_stats=self.epoch_stats)
            else:
                result = bpr_train(
                    np.asarray(coo.rows), np.asarray(coo.cols), coo.shape,
                    self.rank, learning_rate=self.learning_rate,
                    reg=self.regularization, num_epochs=self.num_epochs,
                    batch_size=self.batch_size, seed=self.seed,
                    dtype=self.compute_dtype, verbose=self.show_progress,
                    epoch_stats=self.epoch_stats)
            jax.block_until_ready(result)
        self.factors[self.data.fields.userid] = result.user
        self.factors[self.data.fields.itemid] = result.item

    def _fold_in_users(self, profiles: jax.Array) -> jax.Array:
        return _lstsq_fold_in(profiles,
                              self.factors[self.data.fields.itemid],
                              self.regularization)
