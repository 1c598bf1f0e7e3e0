"""CoFFee (HOOI Tucker) at ML-10M geometry on one chip — a scale the
reference's numba ttm kernels never reached.

The reference's tensor path (``polara/lib/sparse.py:203-234`` dttm +
ARPACK loop) is benchmarked only at ML-1M; at ML-10M the dense
(users x items x levels) tensor is ~14 GiB f32, past the HBM score
budget, so ``CoffeeModel.build`` routes to the COO segment-sum HOOI
(``ops/hooi.py:_hooi_until``): per sweep, each ttm is one fused gather +
``segment_sum`` over the joint (entity, level) key — the (nnz, r)
contribution block at this scale is ~0.5 GiB, the only large transient.

Self-checks: HOOI core-growth convergence below the tolerance, and the
model must beat the popularity baseline on HR@10 (the structural quality
bar — no published reference number exists at this scale, so
``vs_baseline`` is null).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ml10m_coffee.py

Prints ONE JSON line on stdout (progress on stderr).
"""
import json
import sys
import time

import numpy as np

from polara_tpu.runtime.timing import enable_compilation_cache

enable_compilation_cache()

import jax
import pandas as pd

from polara_tpu.data import RecommenderData
from polara_tpu.datasets.synthetic import load_or_make_ml10m
from polara_tpu.models import CoffeeModel, PopularityModel

MLRANK = (13, 10, 2)      # the reference tutorial's CoFFee configuration


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    rows, cols, vals = load_or_make_ml10m(log=log)
    order = np.random.RandomState(11).permutation(len(rows))
    events = pd.DataFrame({
        "userid": rows[order].astype(np.int64),
        "movieid": cols[order].astype(np.int64),
        "rating": vals[order].astype(np.int64)})
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.holdout_size = 1
    data.test_ratio = 0.2
    data.random_holdout = True
    data.prepare()
    model = CoffeeModel(data)
    model.mlrank = MLRANK
    model.verbose = False

    t0 = time.perf_counter()
    model.build()
    log(f"warm-up build (incl. compile): {time.perf_counter() - t0:.1f}s")
    # the feedback level index only exists after a tensor-mode to_coo
    # (i.e. after the first build)
    n_levels = len(data.index.feedback)
    log(f"tensor geometry: {len(data.index.userid.training)} x "
        f"{len(data.index.itemid)} x {n_levels}, "
        f"{len(data.training)} train events")

    timings = []
    for i in range(3):
        model.seed = i + 1          # fresh init; same compiled executable
        t0 = time.perf_counter()
        model.build()
        # block_until_ready does not sync through the axon tunnel
        # (CLAUDE.md): force ONE tiny host copy so the timing is honest
        np.asarray(model.factors["core"]).ravel()[:1]
        timings.append(time.perf_counter() - t0)
        log(f"run {i}: {timings[-1]:.2f}s")
    best = min(timings)

    model.seed = 0
    rel = model.evaluate("relevance", topk=10)
    mp = PopularityModel(data)
    mp.verbose = False
    mp_rel = mp.evaluate("relevance", topk=10)
    log(f"CoFFee hr@10={float(rel.hr):.4f} vs MP hr@10={float(mp_rel.hr):.4f}")
    assert float(rel.hr) > float(mp_rel.hr), \
        "CoFFee fell below the popularity baseline"

    # ---- mlrank tuning (r4 verdict item 6): the reference's ML-1M
    # setting (13,10,2) was carried to ML-10M untuned.  One max-rank
    # build + core-rounding sweeps the grid (the reference's rank-
    # truncation reuse, pipelines.py:141-166)
    from polara_tpu.evaluation.pipelines import find_optimal_tucker_ranks
    t0 = time.perf_counter()
    grid = ((13, 20, 30, 40), (10, 15, 20, 30), (2, 3, 4))
    best_mlrank, scores = find_optimal_tucker_ranks(
        model, grid, "hr", return_scores=True, metric_type="relevance",
        topk=10)
    # pd.Series.idxmax returns np.int64 tuples — not JSON serializable
    best_mlrank = tuple(int(r) for r in best_mlrank)
    t_tune = time.perf_counter() - t0
    log(f"mlrank sweep ({len(scores)} feasible cells, {t_tune:.0f}s):\n"
        f"{scores.to_string()}")
    log(f"best mlrank: {best_mlrank}")

    model.mlrank = tuple(best_mlrank)
    t0 = time.perf_counter()
    model.build()
    np.asarray(model.factors["core"]).ravel()[:1]
    tuned_build = time.perf_counter() - t0
    tuned_rel = model.evaluate("relevance", topk=10)
    tuned_rank = model.evaluate("ranking", topk=10)

    # competitiveness context on the identical split
    from polara_tpu.models import SVDModel
    svd = SVDModel(data)
    svd.rank = 50
    svd.verbose = False
    svd_rel = svd.evaluate("relevance", topk=10)
    log(f"tuned CoFFee {tuple(best_mlrank)}: hr@10 "
        f"{float(tuned_rel.hr):.4f} (build {tuned_build:.1f}s) vs "
        f"PureSVD-50 hr@10 {float(svd_rel.hr):.4f}")

    print(json.dumps({
        "metric": "ml10m_coffee_build",
        "value": round(best, 3),
        "unit": "s",
        "vs_baseline": None,
        "mlrank": list(MLRANK),
        "n_levels": n_levels,
        "nnz": int(len(data.training)),
        "hr10": round(float(rel.hr), 6),
        "hr10_mp_baseline": round(float(mp_rel.hr), 6),
        "tuned_mlrank": list(best_mlrank),
        "tuned_hr10": round(float(tuned_rel.hr), 6),
        "tuned_mrr10": round(float(tuned_rank.mrr), 6),
        "tuned_build_s": round(tuned_build, 2),
        "tune_sweep_s": round(t_tune, 1),
        "tune_cells": int(len(scores)),
        "hr10_puresvd50_same_split": round(float(svd_rel.hr), 6),
    }))


if __name__ == "__main__":
    main()
