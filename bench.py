"""Benchmark: PureSVD rank-50 on ML-10M-shaped data, build + score top-10.

BASELINE.json north star: "PureSVD rank-50 on ML-10M built and all test
users scored top-10 in <2s on a single v5e-8".  The container has no
network egress, so the workload runs on synthetic interactions with the
exact ML-10M geometry (69,878 users x 10,677 items, 10M nonzeros).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline > 1 means faster than the 2 s target.
"""
import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


N_USERS, N_ITEMS, NNZ = 69_878, 10_677, 10_000_054
RANK, TOPK, POWER_ITERS = 50, 10, 6
BASELINE_SECONDS = 2.0


def make_synthetic_ml10m(seed=0):
    rs = np.random.RandomState(seed)
    rows = rs.randint(0, N_USERS, NNZ).astype(np.int32)
    cols = rs.randint(0, N_ITEMS, NNZ).astype(np.int32)
    vals = rs.randint(1, 11, NNZ).astype(np.float32) / 2.0  # 0.5..5 stars
    order = np.argsort(rows, kind="stable")
    return rows[order], cols[order], vals[order]


def main():
    import jax
    import jax.numpy as jnp

    from polara_tpu.runtime.timing import enable_compilation_cache
    enable_compilation_cache()  # persists executables across runs

    log(f"devices: {jax.devices()}")
    rows, cols, vals = make_synthetic_ml10m()
    log(f"synthetic ML-10M: {NNZ} events, {N_USERS}x{N_ITEMS}")

    from polara_tpu.ops.rsvd import randomized_svd
    from polara_tpu.ops.scoring import (ChunkedTestData, run_scoring,
                                        run_scoring_fused)
    from polara_tpu.ops.sparse import CooMatrix

    matrix = CooMatrix.from_numpy(rows, cols, vals, (N_USERS, N_ITEMS),
                                  dtype=jnp.float32)
    dense = jax.block_until_ready(matrix.to_dense())
    log(f"dense ratings resident in HBM: {dense.nbytes / 2**30:.2f} GiB")

    # test data: every user is a test user; profiles are their training rows
    plan = ChunkedTestData.build(rows, cols, vals, n_users=N_USERS,
                                 n_items=N_ITEMS, budget_gb=4.0)
    log(f"chunk plan: {len(plan.chunks)} chunks x {plan.chunk_users} users")

    def score_fn(params, chunk):
        v = params["item_factors"]
        contrib = chunk.vals[:, None].astype(v.dtype) * v[chunk.cols]
        proj = jax.ops.segment_sum(contrib, chunk.rows,
                                   num_segments=chunk.users.shape[0])
        return proj @ v.T

    use_fused = jax.default_backend() == "tpu"
    log(f"scoring backend: {'pallas fused' if use_fused else 'xla'}")

    if use_fused:
        from polara_tpu.ops.pallas import fused_score_topk
        seen_bits = plan.seen_bits(0, N_ITEMS)  # native pack, part of plan
        proj_mm = jax.jit(lambda d, v: d @ v)

    def build_and_score():
        result = randomized_svd(dense, RANK, n_iter=POWER_ITERS, seed=0,
                                dtype=jnp.float32)
        if use_fused:
            # test profiles == training rows: proj is one dense MXU
            # matmul (the per-event segment-sum scatter is the slow path)
            proj = proj_mm(dense, result.v)
            recs = np.asarray(fused_score_topk(
                proj, result.v, seen_bits, TOPK, filter_seen=True,
                n_valid_cols=N_ITEMS))
        else:
            v = jax.block_until_ready(result.v)
            recs = run_scoring(plan, score_fn, {"item_factors": v},
                               topk=TOPK, filter_seen=True,
                               n_valid_cols=N_ITEMS)
        return result, recs

    # warm-up (compilation) round; a Mosaic regression must degrade to
    # the XLA path, never fail the benchmark
    t0 = time.perf_counter()
    try:
        _, recs = build_and_score()
    except Exception as err:  # pragma: no cover - hardware-dependent
        if not use_fused:
            raise
        log(f"pallas backend failed ({err!r}); falling back to xla")
        use_fused = False
        t0 = time.perf_counter()
        _, recs = build_and_score()
    log(f"warm-up (incl. compile): {time.perf_counter() - t0:.2f}s; "
        f"recs shape {recs.shape}")

    timings = []
    for _ in range(3):
        t0 = time.perf_counter()
        build_and_score()
        timings.append(time.perf_counter() - t0)
    best = min(timings)
    log(f"timings: {[f'{t:.3f}' for t in timings]}")
    log(f"scored users/sec at top-{TOPK} (incl. factorization): "
        f"{N_USERS / best:,.0f}")

    print(json.dumps({
        "metric": "ml10m_puresvd50_build_plus_score_top10",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / best, 3),
    }))


if __name__ == "__main__":
    main()
