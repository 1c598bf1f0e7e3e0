"""Warm-start vs standard (known-user) evaluation scenarios.

Counterpart of ``Warm_start_and_standard_scenarios.ipynb``: the same data
model instance switches scenarios through config properties; subscribed
models rebuild/re-predict automatically via the event system.
"""
from polara_tpu import RecommenderData, SVDModel
from polara_tpu.datasets import make_synthetic_interactions


def main():
    events = make_synthetic_interactions(400, 250, 12_000, seed=1)
    data = RecommenderData(events, "userid", "movieid", "rating", seed=0)
    data.verbose = False

    # scenario 4: warm start — test users unseen during training
    data.warm_start = True
    data.test_ratio = 0.2
    data.holdout_size = 1
    svd = SVDModel(data)
    svd.rank = 25
    svd.verbose = False
    warm = svd.evaluate("relevance", simple_rates=True)
    print(f"warm start     HR@{svd.topk}: {float(warm.hr):.4f}")

    # scenario 3: known users — same model instance, data re-splits lazily
    data.warm_start = False
    known = svd.evaluate("relevance", simple_rates=True)
    print(f"known users    HR@{svd.topk}: {float(known.hr):.4f}")

    # scenario 2: holdout only (no user fold)
    data.test_ratio = 0
    holdout_only = svd.evaluate("relevance", simple_rates=True)
    print(f"holdout only   HR@{svd.topk}: {float(holdout_only.hr):.4f}")
    return warm, known, holdout_only


if __name__ == "__main__":
    main()
