"""Model build times at ML-1M geometry vs the reference's recorded CPU
numbers (BASELINE.md).  Run on a real TPU (from the repo root; keep the
axon plugin path if your env uses the tunnel):

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/model_builds.py

Timings are steady-state rebuilds (training matrix HBM-resident,
executables compiled) — the regime of rank sweeps and cross-validation.
"""
import time

import numpy as np

from polara_tpu.data import RecommenderData
from polara_tpu.datasets import make_synthetic_interactions
from polara_tpu.models import (CoffeeModel, CooccurrenceModel, ImplicitALS,
                               ScaledSVD, SVDModel)


def _materialize(model):
    """Force a host copy of the trained factors: through the axon tunnel
    block_until_ready does not synchronize, so this is what makes the
    timings real (see CLAUDE.md)."""
    factors = getattr(model, "factors", None)
    if factors:
        for value in factors.values():
            if value is not None:
                np.asarray(value)
    for attr in ("item_scores", "_i2i_matrix"):
        value = getattr(model, attr, None)
        if value is not None:
            np.asarray(value)


def timed_build(model, n=3, **attrs):
    for key, value in attrs.items():
        setattr(model, key, value)
    model.verbose = False
    model.build()  # compile + ingestion warm-up
    _materialize(model)
    timings = []
    for i in range(n):
        if hasattr(model, "seed"):
            model.seed = i  # vary the factorization's random panel
        t0 = time.perf_counter()
        model.build()
        _materialize(model)
        timings.append(time.perf_counter() - t0)
    return min(timings)


def main():
    events = make_synthetic_interactions(6040, 3706, 1_000_000, seed=0)
    print(f"events: {len(events)} (ML-1M geometry)")
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 1
    data.prepare()

    print(f"PureSVD rank-10 build: {timed_build(SVDModel(data), rank=10):.3f}s"
          " (ref CPU 0.095-0.15s)")
    print(f"ScaledSVD rank-10 build: "
          f"{timed_build(ScaledSVD(data), rank=10):.3f}s (ref 0.534s)")
    print(f"CoFFee (13,10,2) build: "
          f"{timed_build(CoffeeModel(data), n=2):.3f}s (ref 1.18-3.54s)")
    print(f"iALS rank-10 15ep build: "
          f"{timed_build(ImplicitALS(data), n=2, rank=10):.3f}s "
          "(ref 1.6-1.8s)")
    print(f"i2i build: {timed_build(CooccurrenceModel(data)):.3f}s")


if __name__ == "__main__":
    main()
