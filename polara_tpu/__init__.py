"""polara-tpu: a TPU-native recommender-systems research framework.

Re-creation of the capabilities of evfro/polara on a JAX/XLA/Pallas stack:
pandas-based data modelling at the edge, HBM-resident device compute on the
hot path, pjit/mesh sharding for scale-out.
"""

__version__ = "0.1.0"

from polara_tpu.data import RecommenderData
from polara_tpu.models import (RecommenderModel, SVDModel, ScaledSVD,
                               PopularityModel, RandomModel,
                               CooccurrenceModel)

__all__ = ["RecommenderData", "RecommenderModel", "SVDModel", "ScaledSVD",
           "PopularityModel", "RandomModel", "CooccurrenceModel"]
