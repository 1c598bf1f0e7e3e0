"""Quickstart: standard evaluation scenario, model comparison.

Counterpart of the reference's ``Example_ML1M.ipynb``: prepare a data
model, build several recommenders against the same shared data, compare
metric families.  Runs on synthetic data so it works offline; swap in
``get_movielens_data("ml-1m.zip")`` for the real thing.
"""
import pandas as pd

from polara_tpu import (CooccurrenceModel, PopularityModel, RandomModel,
                        RecommenderData, SVDModel)
from polara_tpu.datasets import make_synthetic_interactions
from polara_tpu.evaluation.engine import consolidate_metrics


def main(n_users=500, n_items=300, n_events=15_000):
    events = make_synthetic_interactions(n_users, n_items, n_events, seed=0)
    data = RecommenderData(events, "userid", "movieid", "rating", seed=0)
    data.name = "synthetic"
    data.warm_start = False
    data.test_ratio = 0.2
    data.holdout_size = 3
    data.prepare()

    models = [SVDModel(data), CooccurrenceModel(data),
              PopularityModel(data), RandomModel(data, seed=0)]
    models[0].rank = 30

    scores = {}
    for model in models:
        model.verbose = False
        scores[model.method] = consolidate_metrics(
            model.evaluate("all"), label=model.method)
    table = pd.concat(scores.values(), axis=1)
    print(table.T.round(4))
    return table


if __name__ == "__main__":
    main()
