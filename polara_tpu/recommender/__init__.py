"""Drop-in import-path aliases mirroring the reference package layout.

The reference exposes ``polara.recommender.data`` / ``.models`` /
``.evaluation``; users migrating existing scripts can keep their import
shapes: ``from polara_tpu.recommender.data import RecommenderData``.
"""
from polara_tpu.recommender import data, evaluation, models

__all__ = ["data", "models", "evaluation"]
