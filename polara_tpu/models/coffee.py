"""CoFFee: polarity-aware third-order Tucker model.

Reference: ``CoffeeModel`` (``polara/recommender/models.py:901-1092``) —
HOOI factorization of the user x item x feedback-level tensor, scored by
projecting each test profile through the item/feedback factors.

Scoring reformulation: the reference builds a (users x r1 x r2) outer-
product tensor per chunk and contracts it with the flattened feedback
weights (``models.py:1042-1054``).  Because the flattener always reduces
the feedback factor to a rank-r2 vector first, the contraction collapses
per event to one scalar ``alpha = w[f] . wt`` — so scoring is exactly the
SVD-shaped ``segment_sum(alpha * v[item]) @ v.T`` pipeline, with no rank^2
intermediate at all.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from polara_tpu import config as defaults
from polara_tpu.models.base import RecommenderModel
from polara_tpu.ops.hooi import (hooi, round_core, flatten_feedback_weights)
from polara_tpu.ops.scoring import TestChunk
from polara_tpu.runtime.timing import track_time


class CoffeeModel(RecommenderModel):
    is_tensor_model = True

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._mlrank = defaults.get_default("mlrank")
        self.factors: dict = {}
        self.method = "CoFFee"
        self._flattener = defaults.get_default("flattener")
        self.growth_tol = defaults.get_default("growth_tol")
        self.num_iters = defaults.get_default("num_iters")
        self.show_output = defaults.get_default("show_output")
        self.seed: Optional[int] = None
        # optional (u_item, u_feedback) warm-start panels for HOOI
        # (checkpoint resume / parity runs); None = seeded random init
        self.init_factors = None

    @property
    def mlrank(self):
        return self._mlrank

    @mlrank.setter
    def mlrank(self, new_value):
        if new_value != self._mlrank:
            self._mlrank = new_value
            self._check_reduced_rank(new_value)
            self._recommendations = None

    @property
    def flattener(self):
        return self._flattener

    @flattener.setter
    def flattener(self, new_value):
        if new_value != self._flattener:
            self._flattener = new_value
            self._recommendations = None

    def _check_reduced_rank(self, mlrank) -> None:
        """Core-rounding rank reduction (reference ``models.py:949-980``):
        lowering any mode's rank rotates cached factors through an SVD of
        the unfolded core instead of re-running HOOI."""
        core = self.factors.get("core")
        for mode, entity in enumerate(self.data.fields):
            factor = self.factors.get(entity)
            if factor is None:
                continue
            rank = mlrank[mode]
            if factor.shape[1] < rank:
                self._is_ready = False
                self.factors = {}
                return
            if factor.shape[1] == rank:
                continue
            self.factors = dict(**self.factors)
            rotation, core = round_core(np.asarray(self.factors["core"]),
                                        mode, rank)
            self.factors[entity] = factor @ jnp.asarray(rotation,
                                                        factor.dtype)
            self.factors["core"] = jnp.asarray(core)

    # scores_multiplier stays at the base-class 1: unlike the reference
    # (``models.py:214-221``, feedback-rank inflation), scoring here
    # collapses each event to a scalar weight before the item contraction,
    # so no rank^2 intermediate ever materializes (see module docstring).

    def build(self):
        from polara_tpu import config as defaults
        idx, val, shp = self.data.to_coo(tensor_mode=True)
        budget = int(defaults.get_default("hbm_score_budget_gb") * 2**30)
        itemsize = jnp.dtype(self.compute_dtype).itemsize

        # HBM-resident dense tensor, cached across rebuilds (rank sweeps);
        # the verbose host-stepped loop uses the segment path, so skip
        # the (large) tensor build when per-sweep output is requested
        dense_tensor = None
        if (not self.show_output and self.active_mesh is None
                and int(np.prod(shp)) * itemsize <= budget):
            cache = self.data.__dict__.setdefault("_device_matrix_cache", {})
            # keyed by dtype: the cache is shared across models of this
            # data instance, and an f64 parity build must not pick up a
            # sibling's f32 tensor
            tensor_key = ("coffee_tensor", jnp.dtype(self.compute_dtype))
            dense_tensor = cache.get(tensor_key)
            if dense_tensor is None or dense_tensor.shape != tuple(shp):
                from polara_tpu.ops.sparse import dense_from_coo
                dense_tensor = dense_from_coo(
                    np.asarray(idx), np.asarray(val, np.float64), shp,
                    dtype=self.compute_dtype)
                cache[tensor_key] = dense_tensor

        mesh = self.active_mesh
        with track_time(self.training_time, verbose=self.verbose,
                        model=self.method):
            if mesh is not None:
                from polara_tpu.parallel.distributed import distributed_hooi
                result = distributed_hooi(
                    idx, val, shp, self.mlrank, mesh,
                    num_iters=self.num_iters, growth_tol=self.growth_tol,
                    seed=self.seed, dtype=self.compute_dtype,
                    verbose=self.show_output,
                    init_factors=self.init_factors)
            else:
                result = hooi(idx, val, shp, self.mlrank,
                              num_iters=self.num_iters,
                              growth_tol=self.growth_tol, seed=self.seed,
                              dtype=self.compute_dtype,
                              verbose=self.show_output,
                              dense_tensor=dense_tensor,
                              init_factors=self.init_factors)
            jax.block_until_ready(result.core)
        userid, itemid, feedback = self.data.fields
        self.factors[userid] = result.u0
        self.factors[itemid] = result.u1
        self.factors[feedback] = result.u2
        self.factors["core"] = result.core

    def score_params(self) -> dict:
        itemid = self.data.fields.itemid
        feedback = self.data.fields.feedback
        w = np.asarray(self.factors[feedback])
        wt_flat = flatten_feedback_weights(w, self.flattener)
        if wt_flat.ndim != 1:
            raise ValueError("flattener must reduce the feedback factor to "
                             "a vector")
        # per-feedback-level scalar weights: alpha_f = w[f] . wt_flat
        level_weights = jnp.asarray(w @ wt_flat, self.compute_dtype)
        return {"item_factors": self.factors[itemid],
                "level_weights": level_weights,
                "item_panel": self.factors[itemid]}

    @staticmethod
    def proj_chunk(params: dict, chunk: TestChunk) -> jax.Array:
        v = params["item_factors"]
        # chunk.vals holds the feedback-level INDEX in tensor mode
        levels = chunk.vals.astype(jnp.int32)
        alpha = jnp.where(chunk.valid, params["level_weights"][levels], 0.0)
        contrib = alpha[:, None].astype(v.dtype) * v[chunk.cols]
        return jax.ops.segment_sum(contrib, chunk.rows,
                                   num_segments=chunk.users.shape[0])

    @staticmethod
    def score_chunk(params: dict, chunk: TestChunk) -> jax.Array:
        return CoffeeModel.proj_chunk(params, chunk) \
            @ params["item_panel"].T

    def predict_feedback(self) -> np.ndarray:
        """Rating prediction for the holdout: argmax over the feedback
        axis of the per-event core response (reference
        ``models.py:1068-1092``)."""
        if self.data.warm_start:
            raise NotImplementedError(
                "feedback prediction needs known users")
        userid, itemid, feedback = self.data.fields
        holdout = self.data.test.holdout
        users = jnp.asarray(holdout[userid].values, jnp.int32)
        items = jnp.asarray(holdout[itemid].values, jnp.int32)
        u = self.factors[userid]
        v = self.factors[itemid]
        w = self.factors[feedback]
        g = self.factors["core"]
        # scores[e, f] = w[f] . (G x0 u[user_e] x1 v[item_e])
        gu = jnp.einsum("abc,ea->ebc", g, u[users])
        guv = jnp.einsum("ebc,eb->ec", gu, v[items])
        scores = guv @ w.T
        predictions = np.asarray(jnp.argmax(scores, axis=-1))
        feedback_map = self.data.index.feedback.set_index("new")
        return feedback_map.loc[predictions, "old"].values

    def get_holdout_slice(self, start, stop):
        """Holdout (user_row, item) pairs for a contiguous user-row range
        (reference ``models.py:1056-1064``)."""
        userid = self.data.fields.userid
        itemid = self.data.fields.itemid
        holdout = self.data.test.holdout
        user_sel = (holdout[userid] >= start) & (holdout[userid] < stop)
        holdout_users = holdout.loc[user_sel, userid].values \
            .astype(np.int64) - start
        holdout_items = holdout.loc[user_sel, itemid].values \
            .astype(np.int64)
        return (holdout_users, holdout_items)
