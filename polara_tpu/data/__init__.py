from polara_tpu.data.dataset import (RecommenderData, TestData, Fields,
                                     build_entity_index)
from polara_tpu.data.events import EventNotifier
from polara_tpu.data.scenario import Scenario, UpdateRule, plan_update
from polara_tpu.data.mixins import SampledEvaluationMixin, LongTailMixin

__all__ = ["RecommenderData", "TestData", "Fields", "build_entity_index",
           "EventNotifier", "Scenario", "UpdateRule", "plan_update",
           "SampledEvaluationMixin", "LongTailMixin"]
