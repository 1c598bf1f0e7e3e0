"""Side-information data model: entity similarity matrices.

Reference: ``polara/recommender/hybrid/data.py`` — the data model carries
user/item relation (similarity) matrices supplied in an external id space,
lazily reindexes them to the internal contiguous ids after every split,
and invalidates the cache on training-data changes.

Matrices are stored dense on device (jax arrays): similarity blocks at
catalog scale are exactly what the MXU wants for the downstream Cholesky /
scoring math.  scipy.sparse inputs are densified on ingestion.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd
import jax.numpy as jnp

from polara_tpu.data.dataset import RecommenderData

try:
    import scipy.sparse as _sp
except ImportError:  # pragma: no cover
    _sp = None


class SideRelationsMixin:
    def __init__(self, *args, relations_matrices: Dict,
                 relations_indices: Dict, **kwargs):
        super().__init__(*args, **kwargs)
        entities = [self.fields.userid, self.fields.itemid]
        self._rel_idx = {
            entity: (pd.Series(index=idx, data=np.arange(len(idx)))
                     if idx is not None else None)
            for entity, idx in relations_indices.items()
            if entity in entities}
        self._rel_mat = {}
        for entity, matrix in relations_matrices.items():
            if entity not in entities:
                continue
            if matrix is not None and _sp is not None \
                    and _sp.issparse(matrix):
                matrix = matrix.toarray()
            self._rel_mat[entity] = (jnp.asarray(matrix)
                                     if matrix is not None else None)
        self._relations = dict.fromkeys(entities)
        self.subscribe(self.on_change_event, self._clean_relations)

    def _clean_relations(self):
        self._relations = dict.fromkeys(self._relations.keys())

    @property
    def item_relations(self):
        return self.get_relations_matrix(self.fields.itemid)

    @property
    def user_relations(self):
        return self.get_relations_matrix(self.fields.userid)

    def get_relations_matrix(self, entity: str):
        if self._relations.get(entity) is None:
            self._update_relations(entity)
        return self._relations[entity]

    def _update_relations(self, entity: str) -> None:
        rel_mat = self._rel_mat.get(entity)
        if rel_mat is None:
            self._relations[entity] = None
            return
        if self.verbose:
            print(f"Updating {entity} relations matrix")
        entity_idx = self.get_entity_index(entity)["old"]
        positions = entity_idx.map(self._rel_idx[entity]).values
        if pd.isnull(positions).any():
            raise KeyError(f"some {entity} ids are missing from the "
                           "relations index")
        positions = jnp.asarray(positions.astype(np.int32))
        self._relations[entity] = rel_mat[positions][:, positions]


class IdentityDiagonalMixin:
    """Force a unit diagonal on every relations matrix
    (reference ``hybrid/data.py:58-66``)."""

    def _update_relations(self, *args, **kwargs):
        super()._update_relations(*args, **kwargs)
        for entity, matrix in self._relations.items():
            if matrix is not None:
                eye = jnp.eye(matrix.shape[0], dtype=bool)
                self._relations[entity] = jnp.where(
                    eye, jnp.asarray(1, matrix.dtype), matrix)


class SimilarityDataModel(IdentityDiagonalMixin, SideRelationsMixin,
                          RecommenderData):
    pass
