from polara_tpu.models.base import RecommenderModel, EmbeddingsMixin
from polara_tpu.models.baselines import (PopularityModel, RandomModel,
                                         CooccurrenceModel)
from polara_tpu.models.svd import SVDModel, ScaledSVD, ScaledMatrixMixin
from polara_tpu.models.mf import ProbabilisticMF
from polara_tpu.models.coffee import CoffeeModel
from polara_tpu.models.hybrid import (SimilarityAggregation, KernelizedPMF,
                                      LCEModel, HybridSVD, ScaledHybridSVD)
from polara_tpu.models.coldstart import (
    RandomModelItemColdStart, PopularityModelItemColdStart,
    SimilarityAggregationItemColdStart, SVDModelItemColdStart,
    HybridSVDItemColdStart, ScaledSVDItemColdStart,
    ScaledHybridSVDItemColdStart, LCEModelItemColdStart)
from polara_tpu.models.contextual import ItemPostFilteringMixin
from polara_tpu.models.implicit_mf import ImplicitALS, ImplicitBPR

__all__ = ["RecommenderModel", "EmbeddingsMixin", "PopularityModel",
           "RandomModel", "CooccurrenceModel", "SVDModel", "ScaledSVD",
           "ScaledMatrixMixin", "ProbabilisticMF", "CoffeeModel",
           "SimilarityAggregation", "KernelizedPMF", "LCEModel",
           "HybridSVD", "ScaledHybridSVD", "RandomModelItemColdStart",
           "PopularityModelItemColdStart",
           "SimilarityAggregationItemColdStart", "SVDModelItemColdStart",
           "HybridSVDItemColdStart", "ScaledSVDItemColdStart",
           "ScaledHybridSVDItemColdStart", "LCEModelItemColdStart",
           "ItemPostFilteringMixin", "ImplicitALS", "ImplicitBPR"]
