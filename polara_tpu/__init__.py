"""polara-tpu: a TPU-native recommender-systems research framework.

Re-creation of the capabilities of evfro/polara on a JAX/XLA/Pallas stack:
pandas-based data modelling at the edge, HBM-resident device compute on the
hot path, pjit/mesh sharding for scale-out.

Top-level surface mirrors the reference (``polara/__init__.py:1-16``) plus
the natively re-implemented model families.
"""

__version__ = "0.1.0"

from polara_tpu.data import RecommenderData
from polara_tpu.datasets import (get_amazon_data, get_bookcrossing_data,
                                 get_movielens_data, get_netflix_data)
from polara_tpu.models import (RecommenderModel, SVDModel, ScaledSVD,
                               PopularityModel, RandomModel,
                               CooccurrenceModel)

__all__ = ["RecommenderData", "RecommenderModel", "SVDModel", "ScaledSVD",
           "PopularityModel", "RandomModel", "CooccurrenceModel",
           "get_movielens_data", "get_netflix_data",
           "get_bookcrossing_data", "get_amazon_data"]
