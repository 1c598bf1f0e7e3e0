from polara_tpu.models.base import RecommenderModel, EmbeddingsMixin
from polara_tpu.models.baselines import (PopularityModel, RandomModel,
                                         CooccurrenceModel)
from polara_tpu.models.svd import SVDModel, ScaledSVD, ScaledMatrixMixin
from polara_tpu.models.mf import ProbabilisticMF
from polara_tpu.models.coffee import CoffeeModel

__all__ = ["RecommenderModel", "EmbeddingsMixin", "PopularityModel",
           "RandomModel", "CooccurrenceModel", "SVDModel", "ScaledSVD",
           "ScaledMatrixMixin", "ProbabilisticMF", "CoffeeModel"]
