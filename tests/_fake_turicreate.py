"""Importable fake of the ``turicreate`` package for contract tests.

The real package is absent from this environment; the adapter layer
(``polara_tpu/models/external/turi.py``) owns the SFrame conversion,
side-info id remapping, recommendation reshaping and cold-start
``new_item_data`` plumbing — THAT is what these tests cover.  The fake
implements a deterministic linear factorization (seeded embeddings, side
features folded in by hashed feature vectors) and journals every
create/recommend/predict call.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pandas as pd


class SFrame:
    def __init__(self, data):
        if isinstance(data, SFrame):
            self._frame = data._frame.copy()
        elif isinstance(data, pd.DataFrame):
            self._frame = data.reset_index(drop=True)
        else:
            self._frame = pd.DataFrame(data)

    def __getitem__(self, column):
        return SArray(self._frame[column].values)

    @property
    def column_names(self):
        return list(self._frame.columns)

    def to_dataframe(self):
        return self._frame.copy()

    def __len__(self):
        return len(self._frame)


class SArray:
    def __init__(self, values):
        self._values = np.asarray(values)

    def to_numpy(self):
        return self._values

    def __len__(self):
        return len(self._values)

    def __iter__(self):
        return iter(self._values)


def _as_frame(data) -> pd.DataFrame:
    return data.to_dataframe() if isinstance(data, SFrame) \
        else pd.DataFrame(data)


class FakeTuriModel:
    calls: list = []        # class-level call journal

    def __init__(self, train, user_id, item_id, target, num_factors,
                 random_seed, item_data=None, user_data=None, **params):
        self.user_id, self.item_id, self.target = user_id, item_id, target
        self.num_factors = int(num_factors)
        self.training_time = 0.0
        self._train = _as_frame(train)
        self._item_data = None if item_data is None else _as_frame(item_data)
        self._user_data = None if user_data is None else _as_frame(user_data)
        self._rs = np.random.RandomState(int(random_seed) % (2 ** 31))
        n_users = int(self._train[user_id].max()) + 1
        n_items = int(self._train[item_id].max()) + 1
        self._u = self._rs.randn(n_users, self.num_factors)
        self._v = self._rs.randn(n_items, self.num_factors)
        self._seen = set(zip(self._train[user_id].astype(int),
                             self._train[item_id].astype(int)))

    def _journal(self, call, **info):
        type(self).calls.append({"call": call, **info})

    @classmethod
    def reset_journal(cls):
        cls.calls = []

    def _feature_vector(self, row: pd.Series):
        """Deterministic embedding of a side-feature row (id column
        excluded): stable hash of the feature values -> seeded vector."""
        payload = tuple(sorted((k, str(v)) for k, v in row.items()
                               if k != self.item_id))
        seed = abs(hash(payload)) % (2 ** 31)
        return np.random.RandomState(seed).randn(self.num_factors)

    def recommend(self, users, k, exclude_known=True, verbose=False):
        users = np.asarray(users.to_numpy() if isinstance(users, SArray)
                           else users)
        self._journal("recommend", n_users=len(users), k=int(k),
                      exclude_known=bool(exclude_known))
        rows = {self.user_id: [], self.item_id: [], "score": [],
                "rank": []}
        for u in users.astype(int):
            scores = self._v @ self._u[u]
            if exclude_known:
                for uu, ii in self._seen:
                    if uu == u:
                        scores[ii] = -np.inf
            top = np.argsort(-scores, kind="stable")[:int(k)]
            rows[self.user_id].extend([u] * len(top))
            rows[self.item_id].extend(top.tolist())
            rows["score"].extend(scores[top].tolist())
            rows["rank"].extend(range(1, len(top) + 1))
        return SFrame(rows)

    def predict(self, observation, new_item_data=None):
        obs = _as_frame(observation)
        new_items = None if new_item_data is None else _as_frame(new_item_data)
        self._journal(
            "predict", n_pairs=len(obs),
            new_item_ids=(None if new_items is None
                          else new_items[self.item_id].tolist()),
            new_item_columns=(None if new_items is None
                              else sorted(c for c in new_items.columns
                                          if c != self.item_id)))
        item_vecs = {}
        if new_items is not None:
            for _, row in new_items.iterrows():
                item_vecs[int(row[self.item_id])] = \
                    self._feature_vector(row)
        scores = np.empty(len(obs))
        for pos, (u, i) in enumerate(zip(obs[self.user_id].astype(int),
                                         obs[self.item_id].astype(int))):
            v = item_vecs.get(i)
            if v is None:
                v = self._v[i]
            scores[pos] = float(self._u[u] @ v)
        return SArray(scores)

    def evaluate_rmse(self, dataset, target):
        frame = _as_frame(dataset)
        pred = self.predict(SFrame(frame[[self.user_id, self.item_id]]))
        err = frame[target].values - pred.to_numpy()
        rmse = float(np.sqrt(np.mean(err ** 2)))
        self._journal("evaluate_rmse", n=len(frame), rmse=rmse)
        return {"rmse_overall": rmse}


class _Factory:
    def __init__(self, kind):
        self.kind = kind

    def create(self, train, **params):
        FakeTuriModel.calls.append(
            {"call": "create", "kind": self.kind,
             "params": {k: v for k, v in params.items()
                        if not isinstance(v, SFrame)},
             "item_data_ids": (
                 None if params.get("item_data") is None
                 else params["item_data"][params["item_id"]]
                 .to_numpy().tolist()),
             "item_data_columns": (
                 None if params.get("item_data") is None
                 else params["item_data"].column_names),
             "user_data_ids": (
                 None if params.get("user_data") is None
                 else params["user_data"][params["user_id"]]
                 .to_numpy().tolist()),
             "n_train": len(train)})
        allowed = {"user_id", "item_id", "target", "num_factors",
                   "random_seed", "item_data", "user_data"}
        kwargs = {k: v for k, v in params.items() if k in allowed}
        return FakeTuriModel(train, **kwargs)


def install():
    """Register the fake as the importable ``turicreate`` module (no-op
    when a real turicreate is importable)."""
    if "turicreate" in sys.modules:
        return sys.modules["turicreate"]
    try:
        import turicreate  # noqa: F401 pragma: no cover - real package
        return sys.modules["turicreate"]
    except ImportError:
        pass
    module = types.ModuleType("turicreate")
    module.SFrame = SFrame
    module.SArray = SArray
    recommender = types.ModuleType("turicreate.recommender")
    recommender.factorization_recommender = _Factory("factorization")
    recommender.ranking_factorization_recommender = \
        _Factory("ranking_factorization")
    module.recommender = recommender
    module.__version__ = "6.4-fake"
    sys.modules["turicreate"] = module
    sys.modules["turicreate.recommender"] = recommender
    return module
