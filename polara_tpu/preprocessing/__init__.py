"""Stateless preprocessing utilities (alternative to the stateful data model).

Counterpart of the reference ``polara/preprocessing/`` package: pure
functions over pandas DataFrames and sparse matrices for users who manage
their own experiment pipelines instead of going through
:class:`polara_tpu.data.RecommenderData`.
"""
from polara_tpu.preprocessing import dataframes, features, matrices

__all__ = ["dataframes", "features", "matrices"]
