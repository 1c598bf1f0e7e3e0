from polara_tpu.data.dataset import (RecommenderData, TestData, Fields,
                                     build_entity_index)
from polara_tpu.data.events import EventNotifier
from polara_tpu.data.scenario import Scenario, UpdateRule, plan_update
from polara_tpu.data.mixins import SampledEvaluationMixin, LongTailMixin
from polara_tpu.data.hybrid import (SideRelationsMixin,
                                    IdentityDiagonalMixin,
                                    SimilarityDataModel)
from polara_tpu.data.coldstart import (ItemColdStartData,
                                       ColdSimilarityMixin,
                                       ItemColdStartSimilarityData)
from polara_tpu.data.contextual import ItemPostFilteringData

__all__ = ["RecommenderData", "TestData", "Fields", "build_entity_index",
           "EventNotifier", "Scenario", "UpdateRule", "plan_update",
           "SampledEvaluationMixin", "LongTailMixin", "SideRelationsMixin",
           "IdentityDiagonalMixin", "SimilarityDataModel",
           "ItemColdStartData", "ColdSimilarityMixin",
           "ItemColdStartSimilarityData", "ItemPostFilteringData"]
