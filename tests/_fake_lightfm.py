"""Importable fake of the ``lightfm`` package for contract tests.

The real extension is absent from this environment; the adapter layer
(``polara_tpu/models/external/lightfm.py``) owns the feature stacking,
warm/cold plumbing and score reshaping, and THAT is what these tests
cover.  The fake implements LightFM's documented linear model
``score(u, i) = (f_u · E_u) . (f_i · E_i) + b_u + b_i`` with seeded
random embeddings, and records every constructor/fit/predict call so
tests can assert the adapter's side of the contract.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import scipy.sparse


class FakeLightFM:
    calls: list = []   # class-level call journal, reset via reset_journal

    def __init__(self, no_components=10, item_alpha=0.0, user_alpha=0.0,
                 loss="warp", learning_rate=0.05,
                 learning_schedule="adagrad", max_sampled=10,
                 random_state=None, **kwargs):
        self.no_components = no_components
        self.params = dict(no_components=no_components,
                           item_alpha=item_alpha, user_alpha=user_alpha,
                           loss=loss, learning_rate=learning_rate,
                           learning_schedule=learning_schedule,
                           max_sampled=max_sampled,
                           random_state=random_state, **kwargs)
        self._rs = np.random.RandomState(
            random_state if isinstance(random_state, (int, np.integer))
            else 0)
        self._user_emb = None
        self._item_emb = None
        self._journal("__init__", params=dict(self.params))

    def _journal(self, call, **info):
        type(self).calls.append({"call": call, **info})

    @classmethod
    def reset_journal(cls):
        cls.calls = []

    @staticmethod
    def _feature_count(features, n_entities):
        if features is None:
            return n_entities
        return features.shape[1]

    def _do_fit(self, method, interactions, user_features=None,
                item_features=None, **kwargs):
        n_users, n_items = interactions.shape
        self._n_users, self._n_items = n_users, n_items
        nuf = self._feature_count(user_features, n_users)
        nif = self._feature_count(item_features, n_items)
        if self._user_emb is None or self._user_emb.shape[0] != nuf:
            self._user_emb = self._rs.randn(nuf, self.no_components) \
                .astype(np.float32)
            self._item_emb = self._rs.randn(nif, self.no_components) \
                .astype(np.float32)
        self._journal(
            method, interactions_shape=interactions.shape,
            nnz=int(interactions.nnz),
            user_features_shape=(None if user_features is None
                                 else user_features.shape),
            item_features_shape=(None if item_features is None
                                 else item_features.shape),
            kwargs=dict(kwargs))
        return self

    def fit(self, interactions, **kwargs):
        return self._do_fit("fit", interactions, **kwargs)

    def fit_partial(self, interactions, **kwargs):
        return self._do_fit("fit_partial", interactions, **kwargs)

    def _entity_repr(self, ids, features, emb):
        if features is None:
            return emb[ids]
        features = scipy.sparse.csr_matrix(features)
        return np.asarray(features[ids] @ emb)

    def predict(self, user_ids, item_ids, user_features=None,
                item_features=None, num_threads=1):
        user_ids = np.asarray(user_ids)
        item_ids = np.asarray(item_ids)
        self._journal(
            "predict", n_pairs=len(user_ids),
            user_features_shape=(None if user_features is None
                                 else user_features.shape),
            item_features_shape=(None if item_features is None
                                 else item_features.shape),
            num_threads=num_threads)
        u = self._entity_repr(user_ids, user_features, self._user_emb)
        v = self._entity_repr(item_ids, item_features, self._item_emb)
        return (u * v).sum(axis=1)

    # the reference wrapper reads these for cold-start folding
    @property
    def item_embeddings(self):
        return self._item_emb

    @property
    def user_embeddings(self):
        return self._user_emb


def install():
    """Register the fake as the importable ``lightfm`` module (no-op if a
    real lightfm is importable)."""
    if "lightfm" in sys.modules:
        return sys.modules["lightfm"]
    try:
        import lightfm  # noqa: F401 pragma: no cover - real package
        return sys.modules["lightfm"]
    except ImportError:
        pass
    module = types.ModuleType("lightfm")
    module.LightFM = FakeLightFM
    module.__version__ = "1.17-fake"
    sys.modules["lightfm"] = module
    return module
