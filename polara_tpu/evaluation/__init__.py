from polara_tpu.evaluation.metrics import (compute_metrics,
                                           build_holdout_arrays,
                                           get_experience_scores,
                                           convert_scores_to_series,
                                           Relevance, Ranking, Hits,
                                           Experience)

__all__ = ["compute_metrics", "build_holdout_arrays",
           "get_experience_scores", "convert_scores_to_series",
           "Relevance", "Ranking", "Hits", "Experience"]
