"""Sampled-candidate evaluation for factor models.

Reference: ``RandomSampleEvaluationSVDMixin``
(``polara/recommender/models.py:1095-1183``) — the EigenRec-style
protocol: each test user is ranked over (their holdout items + a fixed
number of unseen items) instead of the whole catalog.  Holdout items
occupy score columns 0..h-1 (the data mixin's rebased ``x_<itemid>``
column), so standard HR/MRR metrics apply unchanged.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

from polara_tpu.ops.sparse import inner_product_at
from polara_tpu.ops.samplers import sampled_scores
from polara_tpu.ops.topk import top_k_indices


class SampledEvaluationSVDMixin:
    """Mix into SVD-family models whose data model carries
    ``unseen_interactions`` (see
    :class:`polara_tpu.data.mixins.SampledEvaluationMixin`)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        prefix = self.data._holdout_item_prefix
        self._prediction_target = f"{prefix}_{self.data.fields.itemid}"

    def _test_user_factors(self):
        """Fold test profiles into factor space: ``P = R_test · V``."""
        itemid = self.data.fields.itemid
        item_factors = self.factors[itemid]
        (user_rows, item_idx, feedback), test_shape, _ = \
            self._get_test_data()
        vals = jnp.asarray(np.asarray(feedback, dtype=np.float64),
                           item_factors.dtype)
        contrib = vals[:, None] * item_factors[jnp.asarray(item_idx)]
        user_factors = jax.ops.segment_sum(
            contrib, jnp.asarray(user_rows, jnp.int32),
            num_segments=test_shape[0])
        return user_factors, item_factors, (user_rows, item_idx)

    def compute_holdout_scores(self, user_factors, item_factors):
        holdout = self.data.test.holdout
        userid = self.data.fields.userid
        itemid = self.data.fields.itemid
        holdout_size = int(self.data.holdout_size)
        if holdout_size < 1:
            raise ValueError("sampled evaluation requires a fixed integer "
                             "holdout size")
        useridx = pd.factorize(holdout[userid], sort=False)[0] \
            .reshape(-1, holdout_size)
        itemidx = holdout[itemid].values.reshape(-1, holdout_size)
        return np.asarray(inner_product_at(
            user_factors, item_factors,
            jnp.asarray(useridx, jnp.int32),
            jnp.asarray(itemidx.astype(np.int32))))

    def compute_random_item_scores(self, user_factors, item_factors):
        """Score pre-registered per-user unseen lists."""
        holdout = self.data.test.holdout
        userid = self.data.fields.userid
        test_users = holdout[userid].drop_duplicates().values
        test_items = self.data.unseen_interactions.loc[test_users].values
        n_users = len(test_users)
        n_items = self.data.unseen_items_num
        useridx = np.broadcast_to(np.arange(n_users)[:, None],
                                  (n_users, n_items))
        itemidx = np.concatenate(test_items).reshape(n_users, n_items)
        return np.asarray(inner_product_at(
            user_factors, item_factors,
            jnp.asarray(useridx, jnp.int32),
            jnp.asarray(itemidx.astype(np.int32))))

    def compute_random_item_scores_gen(self, user_factors, item_factors,
                                       seen_pairs, n_unseen: int):
        """Sample unseen items on the fly (excluding profile + holdout)
        and score them — fused analogue of
        ``compute_random_item_scores_gen`` (``models.py:1137-1156``)."""
        holdout = self.data.test.holdout
        userid = self.data.fields.userid
        itemid = self.data.fields.itemid
        user_rows, item_idx = seen_pairs
        hold_users = pd.factorize(holdout[userid], sort=False)[0]
        all_rows = np.concatenate([user_rows, hold_users])
        all_cols = np.concatenate([item_idx,
                                   holdout[itemid].values]).astype(np.int32)
        key = jax.random.key(0 if self.data.seed is None
                             else int(self.data.seed))
        return np.asarray(sampled_scores(
            user_factors, item_factors,
            jnp.asarray(all_rows, jnp.int32), jnp.asarray(all_cols),
            jnp.ones(len(all_rows), bool), key, n_unseen))

    def get_recommendations(self):
        itemid = self.data.fields.itemid
        if self._prediction_target == itemid:
            return super().get_recommendations()

        if self._prediction_target not in self.data.test.holdout:
            self.data.adapt_holdout()
        user_factors, item_factors, seen_pairs = self._test_user_factors()
        holdout_scores = self.compute_holdout_scores(user_factors,
                                                     item_factors)
        if self.data.unseen_interactions is None:
            n_unseen = self.data.unseen_items_num
            if n_unseen is None:
                raise ValueError(
                    "Number of items to sample is unspecified.")
            unseen_scores = self.compute_random_item_scores_gen(
                user_factors, item_factors, seen_pairs, n_unseen)
        else:
            unseen_scores = self.compute_random_item_scores(
                user_factors, item_factors)
        scores = np.concatenate((holdout_scores, unseen_scores), axis=1)
        return np.asarray(top_k_indices(jnp.asarray(scores), self.topk))
