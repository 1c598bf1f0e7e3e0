"""Item cold-start models: recommend users for cold items.

Reference: ``polara/recommender/coldstart/models.py:13-257``.  The scoring
axis flips — rows are cold items, candidates are (representative) users —
and every factor model folds cold items into the latent space through a
feature mapping ``W = Fᵀ·V`` and its pseudo-inverse gram, all dense MXU
matmuls on device.

Candidate-pool semantics: scores are computed against the representative
user pool when one is configured (and against all training users
otherwise), and the returned recommendation entries are always *internal
user ids* — positions are mapped back through the pool.  (The reference's
LightFM path returns raw pool positions, which misaligns evaluation; the
SVD paths score all users even when the holdout was restricted.  We make
the pool the single source of truth for both.)
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

from polara_tpu.models.base import RecommenderModel
from polara_tpu.models.hybrid import HybridSVD, LCEModel
from polara_tpu.models.svd import ScaledMatrixMixin, SVDModel
from polara_tpu.ops.topk import top_k_indices
from polara_tpu.preprocessing.features import stack_features


def _pad_user_columns(recs: np.ndarray, topk: int) -> np.ndarray:
    """Pad recommendation rows to the (n_cold, topk) contract when the
    candidate pool is smaller than topk (PAD_CONST like the top-k ops)."""
    from polara_tpu.ops.topk import PAD_CONST
    if recs.shape[1] >= topk:
        return recs[:, :topk]
    pad = np.full((recs.shape[0], topk - recs.shape[1]), PAD_CONST,
                  dtype=recs.dtype)
    return np.concatenate([recs, pad], axis=1)


class ItemColdStartEvaluationMixin:
    """Flip prediction key/target; nothing is 'seen' for a cold item
    (reference ``coldstart/models.py:13-18``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.filter_seen = False
        self._prediction_key = self.data.cold_itemid
        self._prediction_target = self.data.fields.userid


class ColdItemsScoringMixin:
    """Driver: dense (cold items × candidate users) scores → top-k user
    ids.  Subclasses implement ``compute_cold_scores(candidates)``
    returning a device score block over the candidate columns."""

    def _candidate_users(self) -> Optional[np.ndarray]:
        repr_users = self.data.representative_users
        if repr_users is None:
            return None
        return repr_users["new"].values

    def get_recommendations(self) -> np.ndarray:
        if self.verify_integrity:
            self.verify_data_integrity()
        candidates = self._candidate_users()
        scores = self.compute_cold_scores(candidates)
        recs = np.asarray(top_k_indices(scores, self.topk))
        if candidates is not None:
            valid = recs >= 0
            recs = np.where(valid, candidates[np.where(valid, recs, 0)],
                            recs)
        return recs

    def cold_item_metadata(self) -> pd.DataFrame:
        """Feature rows of the cold items in cold-index order."""
        cold_old = self.data.index.itemid.cold_start["old"].values
        meta = self.item_features.reindex(cold_old)
        return meta.apply(lambda col: col.map(
            lambda v: v if isinstance(v, (list, tuple, set)) else []))


class RandomModelItemColdStart(ItemColdStartEvaluationMixin,
                               ColdItemsScoringMixin, RecommenderModel):
    """'RND(cs)': uniformly random users per cold item."""

    def __init__(self, *args, seed=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.seed = seed
        self.method = "RND(cs)"

    def build(self):
        self._random_state = np.random.RandomState(self.seed)

    def get_recommendations(self):
        candidates = self._candidate_users()
        if candidates is None:
            candidates = self.data.index.userid.training["new"].values
        n_cold = self.data.index.itemid.cold_start.shape[0]
        take = min(self.topk, len(candidates))
        keys = self._random_state.rand(n_cold, len(candidates))
        top = np.argpartition(keys, take - 1, axis=1)[:, :take]
        return _pad_user_columns(candidates[top], self.topk)


class PopularityModelItemColdStart(ItemColdStartEvaluationMixin,
                                   ColdItemsScoringMixin, RecommenderModel):
    """'MP(cs)': the most active users, identically for every cold item."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.method = "MP(cs)"

    def build(self):
        userid = self.data.fields.userid
        user_activity = self.data.training[userid].value_counts(sort=False)
        repr_users = self.data.representative_users
        if repr_users is not None:
            user_activity = user_activity.reindex(repr_users["new"].values,
                                                  fill_value=0)
        self.user_scores = user_activity.sort_values(ascending=False)

    def get_recommendations(self):
        n_cold = self.data.index.itemid.cold_start.shape[0]
        top_users = self.user_scores.index[:self.topk].values
        recs = np.broadcast_to(top_users, (n_cold, len(top_users))).copy()
        return _pad_user_columns(recs, self.topk)


class SimilarityAggregationItemColdStart(ItemColdStartEvaluationMixin,
                                         ColdItemsScoringMixin,
                                         RecommenderModel):
    """'SIM(cs)': score = S(cold, seen) · Rᵀ
    (reference ``coldstart/models.py:101-119``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.method = "SIM(cs)"
        self.implicit = False

    def build(self):
        pass

    def compute_cold_scores(self, candidates) -> jax.Array:
        similarity = self.data.cold_items_similarity
        ratings = self.get_training_matrix(dense=True,
                                           ignore_feedback=self.implicit)
        scores = similarity.astype(ratings.dtype) @ ratings.T
        if candidates is not None:
            scores = scores[:, jnp.asarray(candidates.astype(np.int32))]
        return scores


class ItemColdStartSVDModelMixin:
    """Feature fold-in for the SVD family: map one-hot item features onto
    item factors (``W = FᵀV``), invert its gram, and project cold feature
    rows into the latent space (reference ``coldstart/models.py:149-222``).
    Rank truncation keeps the trick compatible with cheap rank sweeps."""

    def __init__(self, *args, item_features=None, **kwargs):
        super().__init__(*args, **kwargs)
        if item_features is None:  # provided via the data model
            item_features = self.data.item_features
        assert item_features is not None
        self.item_features = item_features
        self.item_features_labels = None
        self._transform_invgram = None
        self.data.subscribe(self.data.on_change_event, self._clean_metadata)

    def _clean_metadata(self):
        self.item_features_labels = None

    @property
    def item_features_embeddings(self):
        return self.factors.get(f"{self.data.fields.itemid}_features")

    def _check_reduced_rank(self, rank):
        super()._check_reduced_rank(rank)
        mapping = self.item_features_embeddings
        if mapping is None:
            self._transform_invgram = None
        elif (self._transform_invgram is not None
              and self._transform_invgram.shape[0] != mapping.shape[1]):
            # any mismatch, not just shrinkage: a sweep can leave a low-rank
            # invgram behind and the user may then *raise* the rank back
            # within the cached factors' width (truncation keeps factors
            # wide enough, but the gram inverse was built at the old rank)
            self.update_item_features_transform()

    def encode_item_features(self):
        training_items = self.data.index.itemid.training["old"].values
        meta = self.item_features.reindex(training_items)
        meta = meta.apply(lambda col: col.map(
            lambda v: v if isinstance(v, (list, tuple, set)) else []))
        one_hot, self.item_features_labels = stack_features(
            meta, stacked_index=False, normalize=False)
        return one_hot

    def update_item_features_transform(self):
        mapping = self.item_features_embeddings
        gram = mapping.T @ mapping
        self._transform_invgram = jnp.linalg.pinv(gram)

    def build(self, *args, **kwargs):
        super().build(*args, return_factors="uv", **kwargs)
        one_hot = self.encode_item_features()
        mapping = self.compute_item_features_mapping(one_hot)
        # stored in factors so rank truncation shortens it automatically
        self.factors[f"{self.data.fields.itemid}_features"] = mapping
        self.update_item_features_transform()

    def _map_features_to_factors(self, one_hot, factors) -> jax.Array:
        """host-sparse Fᵀ (n_labels × n_items) times device factors."""
        return jnp.asarray(one_hot.T @ np.asarray(factors))

    def compute_cold_scores(self, candidates) -> jax.Array:
        cold_meta = self.cold_item_metadata()
        cold_one_hot, _ = stack_features(cold_meta,
                                         labels=self.item_features_labels,
                                         normalize=False)
        w = self.item_features_embeddings
        cold_features_w = jnp.asarray(cold_one_hot @ np.asarray(w))
        cold_factors = cold_features_w @ self._transform_invgram

        userid = self.data.fields.userid
        u = self.factors[userid]
        s = self.factors["singular_values"]
        user_panel = u * s[None, :]
        if candidates is not None:
            user_panel = user_panel[jnp.asarray(candidates.astype(np.int32))]
        return cold_factors.astype(user_panel.dtype) @ user_panel.T


class SVDModelItemColdStart(ItemColdStartEvaluationMixin,
                            ColdItemsScoringMixin,
                            ItemColdStartSVDModelMixin, SVDModel):
    """'PureSVD(cs)'."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.method = "PureSVD(cs)"

    def compute_item_features_mapping(self, one_hot) -> jax.Array:
        item_factors = self.factors[self.data.fields.itemid]
        return self._map_features_to_factors(one_hot, item_factors)


class HybridSVDItemColdStart(ItemColdStartEvaluationMixin,
                             ColdItemsScoringMixin,
                             ItemColdStartSVDModelMixin, HybridSVD):
    """'HybridSVD(cs)': cold features map onto the right projector."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.method = "HybridSVD(cs)"

    def compute_item_features_mapping(self, one_hot) -> jax.Array:
        itemid = self.data.fields.itemid
        projector = self.factors[f"{itemid}_projector_right"]
        return self._map_features_to_factors(one_hot, projector)


class ScaledSVDItemColdStart(ScaledMatrixMixin, SVDModelItemColdStart):
    pass


class ScaledHybridSVDItemColdStart(ScaledMatrixMixin, HybridSVDItemColdStart):
    pass


class LCEModelItemColdStart(ItemColdStartEvaluationMixin,
                            ColdItemsScoringMixin, LCEModel):
    """'LCE(cs)': fold cold-item features through the feature-factor gram
    (reference ``coldstart/models.py:122-146``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.method = "LCE(cs)"
        self.item_features_invgram = None

    @property
    def item_data(self):
        """Training-item feature rows (cold items are excluded from the
        training index by construction)."""
        if self.item_features is None:
            return None
        if self._item_data is None:
            item_index = self.data.index.itemid.training
            reindexed = self.item_features.reindex(item_index["old"].values)
            self._item_data = reindexed.apply(lambda col: col.map(
                lambda v: v if isinstance(v, (list, tuple, set)) else []))
        return self._item_data

    def build(self, *args, **kwargs):
        super().build(*args, **kwargs)
        hs = self.factors[f"{self.data.fields.itemid}_features"].T  # k × f
        self.item_features_invgram = jnp.linalg.pinv(hs @ hs.T)

    def compute_cold_scores(self, candidates) -> jax.Array:
        cold_meta = self.cold_item_metadata()
        cold_one_hot, _ = stack_features(cold_meta,
                                         labels=self.item_features_labels,
                                         normalize=False)
        hs = self.factors[f"{self.data.fields.itemid}_features"]  # f × k
        cold_factors = (jnp.asarray(cold_one_hot @ np.asarray(hs))
                        @ self.item_features_invgram)
        cold_factors = jnp.maximum(cold_factors, 0.0)
        hu = self.factors[self.data.fields.userid]  # n_users × k
        if candidates is not None:
            hu = hu[jnp.asarray(candidates.astype(np.int32))]
        return cold_factors.astype(hu.dtype) @ hu.T
