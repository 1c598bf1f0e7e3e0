"""Benchmark: PureSVD rank-50 on ML-10M-shaped data, build + score top-10.

BASELINE.json north star: "PureSVD rank-50 on ML-10M built and all test
users scored top-10 in <2s on a single v5e-8".  The container has no
network egress, so the workload runs on calibrated synthetic interactions
with the exact ML-10M geometry (69,878 users x 10,677 items, ~10M
nonzeros): Zipf popularity/activity margins, slowly decaying latent
spectrum and preference-correlated exposure (see
``polara_tpu.datasets.synthetic.make_realistic_coo``), so both the rsvd
convergence regime and the top-k tie mass resemble the real dataset
rather than a flat uniform matrix.

Besides the timing, the run verifies itself (round-1 verdict: a
time-only bench cannot detect wrong math):

* ``accuracy`` — max relative singular-triplet residual
  ``max_i |A v_i - s_i u_i| / s_1``: ~0 for a converged truncated SVD,
  large if the factorization silently diverged;
* ``fused_ok`` — the fused Pallas score->mask->top-k recommendations are
  re-scored against the XLA reference path on a user slice; any pick
  whose true score deviates beyond tolerance fails the check.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline > 1 means faster than the 2 s target.
"""
import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


N_USERS, N_ITEMS, NNZ = 69_878, 10_677, 10_000_054
# 6 power iterations: the exact-factor study (below, and the r3 sweep)
# shows the end metrics are already converged — HR/NDCG@10 deltas vs f64
# ARPACK are ~4e-5 at 6 iters (3e-5 at 10, 1e-5 at 4) with >=99.7%
# top-10 overlap — so the extra iterations only polish the triplet
# residual (1.66e-3 at 10 vs ~2.2e-3 at 6), not a single delivered
# recommendation metric.  ~19ms saved per build.
RANK, TOPK, POWER_ITERS = 50, 10, 6
BASELINE_SECONDS = 2.0
VERIFY_USERS = 4096          # slice re-scored through the XLA path
CACHE = "/tmp/polara_tpu_bench_ml10m_v1.npz"
EXACT_CACHE = "/tmp/polara_tpu_bench_ml10m_v1_exact50.npz"


def load_or_make_workload(seed=0, device=False):
    """Calibrated ML-10M-geometry interactions, cached on disk.  The
    Gumbel-top-k generation runs on the accelerator
    (``make_realistic_coo_device``) — the (users × items) keying/sorting
    is hopeless on the slow host CPU but takes seconds on device.
    ``device=True`` regenerates on the accelerator and keeps the stream
    there (zero host→device wire — the tunnel's bulk upload collapses
    below 0.1 MB/s in bad epochs, measured r5)."""
    from polara_tpu.datasets.synthetic import load_or_make_ml10m
    return load_or_make_ml10m(CACHE, seed=seed, log=log, device=device)


def _probe_device(timeout_s: float = 300.0) -> None:
    """The axon tunnel can wedge outright (r5: 2+ hours where even
    `import jax` from a fresh process hangs inside the backend
    registration).  A blocked first RPC would hang the whole benchmark
    with no output, so bound a tiny matmul in a SUBPROCESS (killable —
    a stuck in-process RPC thread cannot be cancelled, and the first
    device op deadlocks when issued from a non-main thread under the
    axon backend) and emit a diagnosable error payload instead.
    ``POLARA_SKIP_PROBE=1`` disables the probe."""
    import subprocess

    if os.environ.get("POLARA_SKIP_PROBE"):
        return
    code = ("import numpy as np, jax.numpy as jnp; "
            "np.asarray((jnp.ones((8,128)) @ jnp.ones((128,8)))"
            ".ravel()[:1]); print('PROBE_OK')")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s)
        if "PROBE_OK" in (out.stdout or ""):
            return
        reason = (f"probe subprocess exited {out.returncode}: "
                  f"{(out.stderr or '')[-200:]}")
    except subprocess.TimeoutExpired:
        reason = f"device unresponsive after {timeout_s:.0f}s probe"
    log(f"device probe failed — {reason}")
    print(json.dumps({
        "metric": "ml10m_puresvd50_build_plus_score_top10",
        "value": None, "unit": "s", "vs_baseline": None,
        "error": reason + " (tunnel wedge — see CLAUDE.md)"}))
    sys.stdout.flush()
    os._exit(3)


def main():
    _probe_device()
    import jax
    import jax.numpy as jnp

    from polara_tpu.runtime.timing import enable_compilation_cache
    enable_compilation_cache()  # persists executables across runs

    log(f"devices: {jax.devices()}")
    use_fused = jax.default_backend() == "tpu"
    rows, cols, vals = load_or_make_workload()
    nnz = len(rows)
    log(f"calibrated ML-10M: {nnz} events, {N_USERS}x{N_ITEMS}")

    from polara_tpu.ops.rsvd import randomized_svd
    from polara_tpu.ops.scoring import ChunkedTestData, run_scoring
    from polara_tpu.ops.sparse import CooMatrix, dense_power_operator
    from polara_tpu.ops.topk import mask_and_topk

    if use_fused:
        # zero-wire staging: regenerate the seeded stream on device (the
        # npz host copy above serves ARPACK + host-side checks) and
        # spot-check identity
        rows_d, cols_d, vals_d = load_or_make_workload(device=True)
        stride = max(1, nnz // 64)
        same = (np.array_equal(np.asarray(rows_d[::stride]),
                               rows[::stride])
                and np.array_equal(np.asarray(cols_d[::stride]),
                                   cols[::stride])
                and np.array_equal(np.asarray(vals_d[::stride]),
                                   vals[::stride].astype(np.float32)))
        log(f"device-regen vs npz identity spot-check (64 points): {same}")
        if not same:  # pragma: no cover - cross-backend determinism break
            log("falling back to host upload (regen diverged)")
            matrix = CooMatrix.from_numpy(rows, cols, vals,
                                          (N_USERS, N_ITEMS),
                                          dtype=jnp.float32)
            rows_d, cols_d, vals_d = matrix.rows, matrix.cols, matrix.vals
        matrix = CooMatrix(rows_d, cols_d, vals_d, (N_USERS, N_ITEMS))
    else:
        matrix = CooMatrix.from_numpy(rows, cols, vals, (N_USERS, N_ITEMS),
                                      dtype=jnp.float32)
    dense = jax.block_until_ready(matrix.to_dense())
    log(f"dense ratings resident in HBM: {dense.nbytes / 2**30:.2f} GiB")

    def score_fn(params, chunk):
        v = params["item_factors"]
        contrib = chunk.vals[:, None].astype(v.dtype) * v[chunk.cols]
        proj = jax.ops.segment_sum(contrib, chunk.rows,
                                   num_segments=chunk.users.shape[0])
        return proj @ v.T

    log(f"scoring backend: {'pallas fused' if use_fused else 'xla'}")

    if use_fused:
        from polara_tpu.ops.pallas import (fused_score_topk,
                                           pack_seen_bits_device)
        # popularity-ordered item layout + tile-skip merge guard:
        # measured 1.51x on the scoring phase at this geometry
        # (benchmarks/tile_skip_ab.py; top-k set unchanged).  The
        # permutation depends only on the interaction counts, so it
        # stages once, outside the timed region, like the seen bits.
        counts = jax.ops.segment_sum(jnp.ones_like(matrix.vals),
                                     matrix.cols, num_segments=N_ITEMS)
        perm_dev = jnp.argsort(-counts).astype(jnp.int32)
        inv_dev = jnp.zeros((N_ITEMS,), jnp.int32).at[perm_dev].set(
            jnp.arange(N_ITEMS, dtype=jnp.int32))
        seen_bits = pack_seen_bits_device(matrix.rows,
                                          inv_dev[matrix.cols],
                                          N_USERS, N_ITEMS)
        plan = None
    else:
        # test data: every user is a test user; profiles are their
        # training rows (host plan only feeds the XLA fallback path)
        plan = ChunkedTestData.build(rows, cols, vals, n_users=N_USERS,
                                     n_items=N_ITEMS, budget_gb=4.0)
        log(f"chunk plan: {len(plan.chunks)} chunks x "
            f"{plan.chunk_users} users")
    proj_mm = jax.jit(lambda d, v: d @ v)
    to_i16 = jax.jit(lambda r: r.astype(jnp.int16))

    def build_and_score(ratings):
        # bf16 power iterations (halved HBM traffic on the dominant
        # matvecs) + f32 refinement ladder + f32 Rayleigh-Ritz: measured
        # the same max triplet residual as the all-f32 path (1.66e-3)
        # at ~25% less wall time; the bf16 cast is timed as part of the
        # build
        result = randomized_svd(ratings, RANK, n_iter=POWER_ITERS, seed=0,
                                dtype=jnp.float32,
                                power_operator=dense_power_operator(
                                    ratings))
        if use_fused:
            # test profiles == training rows: proj is one dense MXU
            # matmul (the per-event segment-sum scatter is the slow path)
            proj = proj_mm(ratings, result.v)
            recs_dev = fused_score_topk(
                proj, jnp.take(result.v, perm_dev, axis=0), seen_bits,
                TOPK, filter_seen=True, n_valid_cols=N_ITEMS,
                tile_skip=True)
            # map popularity-layout positions back to item ids (all
            # N_ITEMS columns are valid here, so no PAD slots occur)
            recs_dev = jnp.take(perm_dev, recs_dev)
            # ship ids as int16 (catalog < 32k; PAD_CONST=-1 fits) — the
            # top-10 panel is ~2.8MB at int32 and the device->host copy
            # is bandwidth-bound, so halving the wire format is real
            # end-to-end latency, same as the serving path's id encoding
            recs = np.asarray(to_i16(recs_dev)).astype(np.int32)
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
        result, recs = build_and_score(dense)
    except Exception as err:  # pragma: no cover - hardware-dependent
        if not use_fused:
            raise
        log(f"pallas backend failed ({err!r}); falling back to xla")
        use_fused = False
        plan = ChunkedTestData.build(rows, cols, vals, n_users=N_USERS,
                                     n_items=N_ITEMS, budget_gb=4.0)
        t0 = time.perf_counter()
        result, recs = build_and_score(dense)
    log(f"warm-up (incl. compile): {time.perf_counter() - t0:.2f}s; "
        f"recs shape {recs.shape}")

    timings = []
    for i in range(3):
        # perturb one rating so a caching/async-dispatch artifact cannot
        # fake the timing (the tunnel's block_until_ready does not sync;
        # the host copy inside build_and_score is the true barrier)
        varied = dense.at[0, 0].add(np.float32(1e-3 * (i + 1)))
        t0 = time.perf_counter()
        build_and_score(varied)
        timings.append(time.perf_counter() - t0)
    best = min(timings)
    log(f"timings: {[f'{t:.3f}' for t in timings]}")
    log(f"scored users/sec at top-{TOPK} (incl. factorization): "
        f"{N_USERS / best:,.0f}")

    # ---- accuracy: singular-triplet residual of the final factorization.
    # For exact truncated SVD, A v_i = s_i u_i; the residual measures how
    # far the randomized solver is from a true invariant subspace.
    av = proj_mm(dense, result.v)                       # (m, k)
    resid = av - result.u * result.s[None, :]
    triplet_resid = jnp.linalg.norm(resid, axis=0) / result.s[0]
    accuracy = float(jnp.max(triplet_resid))
    log(f"max triplet residual |A v - s u| / s_1: {accuracy:.2e}")

    # ---- fused-kernel verification: re-score the fused picks through the
    # XLA path on a user slice; every pick must carry (numerically) the
    # same score as the reference pick in the same slot.
    fused_ok = None
    if use_fused:
        # rows are sorted, so the first VERIFY_USERS users' events are a
        # prefix of the device stream — no event upload, scalars down
        n_sel = int(jnp.searchsorted(matrix.rows, VERIFY_USERS))
        xla_recs = mask_and_topk(
            dense[:VERIFY_USERS] @ result.v @ result.v.T,
            matrix.rows[:n_sel], matrix.cols[:n_sel],
            jnp.ones(n_sel, bool), TOPK, filter_seen=True,
            n_valid_cols=N_ITEMS)

        @jax.jit
        def fused_gap(dense_head, v, xla_recs, fused_recs):
            scores = dense_head @ v @ v.T
            s_xla = jnp.take_along_axis(scores, xla_recs, axis=1)
            s_fused = jnp.take_along_axis(scores, fused_recs, axis=1)
            scale = jnp.maximum(jnp.max(jnp.abs(s_xla)), 1e-6)
            gap = jnp.max(jnp.abs(s_xla - s_fused)) / scale
            agree = jnp.mean((xla_recs == fused_recs).astype(jnp.float32))
            return jnp.stack([gap, agree])

        gap_agree = np.asarray(fused_gap(
            dense[:VERIFY_USERS], result.v, xla_recs,
            jnp.asarray(recs[:VERIFY_USERS])))
        max_gap, exact = float(gap_agree[0]), float(gap_agree[1])
        fused_ok = bool(max_gap < 1e-3)
        log(f"fused vs xla on {VERIFY_USERS} users: exact agreement "
            f"{exact:.4f}, max relative score gap {max_gap:.2e} "
            f"-> fused_ok={fused_ok}")

    # ---- north-star closure: does the f32 factorization floor change
    # the END metrics?  BASELINE.json demands svds-grade subspaces; the
    # honest check at this scale is the metric-level delta between the
    # TPU f32 factors and an exact f64 ARPACK factorization (the
    # reference's solver, ``polara/recommender/models.py:844``) of the
    # SAME held-out split, both scored through the SAME device path.
    exact = exact_factor_study(dense, rows, cols, vals, use_fused,
                               seen_bits if use_fused else None,
                               perm=perm_dev if use_fused else None,
                               inv=inv_dev if use_fused else None)

    print(json.dumps({
        "metric": "ml10m_puresvd50_build_plus_score_top10",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / best, 3),
        "accuracy": round(accuracy, 8),
        "fused_ok": fused_ok,
        **exact,
    }))


def _holdout_split(rows, cols, seed=7):
    """One seeded held-out event per user (rows must be sorted)."""
    uniq, start, counts = np.unique(rows, return_index=True,
                                    return_counts=True)
    rs = np.random.RandomState(seed)
    pick = start + (rs.rand(len(uniq)) * counts).astype(np.int64)
    hold_mask = np.zeros(len(rows), dtype=bool)
    hold_mask[pick] = True
    return uniq, cols[pick], hold_mask


def _exact_reference_v(rows, cols, vals, hold_mask):
    """Rank-RANK f64 ARPACK item factors of the train split, cached
    (~20s on the host once per workload)."""
    if os.path.exists(EXACT_CACHE):
        data = np.load(EXACT_CACHE)
        if data["nnz"] == int((~hold_mask).sum()):
            return data["v"], data["s"]
    import scipy.sparse as sp
    from scipy.sparse.linalg import svds
    keep = ~hold_mask
    matrix = sp.csr_matrix(
        (vals[keep].astype(np.float64), (rows[keep], cols[keep])),
        shape=(N_USERS, N_ITEMS))
    t0 = time.perf_counter()
    v0 = np.random.RandomState(0).randn(min(matrix.shape))  # seeded ARPACK
    _, s, vt = svds(matrix, k=RANK, v0=v0)
    order = np.argsort(s)[::-1]
    v, s = vt[order].T.copy(), s[order]
    log(f"exact f64 ARPACK factorization: {time.perf_counter() - t0:.1f}s "
        "(cached)")
    np.savez(EXACT_CACHE, v=v, s=s, nnz=int(keep.sum()))
    return v, s


def exact_factor_study(dense, rows, cols, vals, use_fused,
                       full_bits=None, perm=None, inv=None):
    """``perm``/``inv``: the popularity layout of ``full_bits`` — the
    whole study runs in permuted item space (panel rows, holdout ids,
    and recommendations all mapped consistently), so the metric deltas
    are unchanged by the layout."""
    import jax
    import jax.numpy as jnp

    from polara_tpu.ops.rsvd import randomized_svd
    from polara_tpu.ops.sparse import dense_power_operator

    hold_users, hold_items, hold_mask = _holdout_split(rows, cols)
    # dense ratings of the TRAIN split: zero the held-out entries
    dense_train = dense.at[jnp.asarray(hold_users),
                           jnp.asarray(hold_items)].set(0.0)
    # vals comes from main()'s workload arrays — re-reading the cache
    # file here would crash when the cache write failed (tolerated by
    # load_or_make_benchmark_coo)
    v_exact, s_exact = _exact_reference_v(rows, cols, vals, hold_mask)

    result = randomized_svd(dense_train, RANK, n_iter=POWER_ITERS, seed=0,
                            dtype=jnp.float32,
                            power_operator=dense_power_operator(
                                dense_train))

    keep = ~hold_mask
    # NOTE: every big array travels as a jit ARGUMENT — a closure
    # constant of this size would be baked into the executable and
    # stall compilation (repo convention, CLAUDE.md)
    if use_fused:
        from polara_tpu.ops.pallas import (clear_seen_bits_device,
                                           fused_score_topk)
        # train-split bitmask = full-stream bitmask with the held-out
        # bits cleared on device — zero wire beyond the (n_users,) ids.
        # full_bits lives in the popularity layout, so the held-out
        # item ids map through inv first.
        hold_items_dev = jnp.asarray(hold_items.astype(np.int32))
        if inv is not None:
            hold_items_dev = jnp.take(inv, hold_items_dev)
        bits = clear_seen_bits_device(
            full_bits, jnp.asarray(hold_users.astype(np.int32)),
            hold_items_dev)

        def recs_for(train, v_panel, bits):
            if perm is not None:
                v_scores = jnp.take(v_panel, perm, axis=0)
            else:
                v_scores = v_panel
            proj = train @ v_panel
            return fused_score_topk(proj, v_scores, bits, TOPK,
                                    filter_seen=True,
                                    n_valid_cols=N_ITEMS,
                                    tile_skip=perm is not None)
    else:
        from polara_tpu.ops.topk import mask_and_topk
        bits = (jnp.asarray(rows[keep], jnp.int32),
                jnp.asarray(cols[keep], jnp.int32),
                jnp.ones(int(keep.sum()), bool))

        def recs_for(train, v_panel, bits):
            scores = (train @ v_panel) @ v_panel.T
            return mask_and_topk(scores, *bits, TOPK,
                                 filter_seen=True, n_valid_cols=N_ITEMS)

    @jax.jit
    def study(train, v_f32, v_ex, bits, target):
        recs_a = recs_for(train, v_f32, bits)
        recs_b = recs_for(train, v_ex, bits)
        target = target[:, None]

        def hr_ndcg(recs):
            hit = recs == target
            found = hit.any(axis=1)
            rank = jnp.where(found, jnp.argmax(hit, axis=1) + 1, 0)
            hr = jnp.mean(found)
            ndcg = jnp.mean(jnp.where(
                found, 1.0 / jnp.log2(1.0 + jnp.maximum(rank, 1)), 0.0))
            return hr, ndcg

        hr_a, ndcg_a = hr_ndcg(recs_a)
        hr_b, ndcg_b = hr_ndcg(recs_b)
        overlap = jnp.mean(jnp.sum(
            (recs_a[:, :, None] == recs_b[:, None, :])
            & (recs_a >= 0)[:, :, None], axis=(1, 2)) / TOPK)
        return jnp.stack([hr_a, ndcg_a, hr_b, ndcg_b, overlap])

    target = jnp.asarray(hold_items)
    if use_fused and inv is not None:
        target = jnp.take(inv, target)   # recs are in the pop layout
    out = np.asarray(study(dense_train, result.v,
                           jnp.asarray(v_exact, jnp.float32), bits,
                           target))
    hr_f32, ndcg_f32, hr_ex, ndcg_ex, overlap = (float(x) for x in out)
    delta = max(abs(hr_f32 - hr_ex), abs(ndcg_f32 - ndcg_ex))
    log(f"exact-factor study (1 held-out event/user): "
        f"HR@{TOPK} f32={hr_f32:.5f} exact={hr_ex:.5f}; "
        f"NDCG@{TOPK} f32={ndcg_f32:.5f} exact={ndcg_ex:.5f}; "
        f"top-{TOPK} overlap {overlap:.5f}")
    return {
        "hr10_f32": round(hr_f32, 6),
        "hr10_exact": round(hr_ex, 6),
        "ndcg10_f32": round(ndcg_f32, 6),
        "ndcg10_exact": round(ndcg_ex, 6),
        "metric_delta_vs_exact": round(delta, 6),
        "top10_overlap": round(overlap, 6),
    }


if __name__ == "__main__":
    main()
