"""Netflix-prize scale iALS (480,189 x 17,770, ~98M events) on ONE chip
through the streaming tile-aligned event sweeps — with HOLDOUT METRICS
and a dense-tier anchor, not just a loss curve.

The dense-block iALS (`ops/implicit.py:ials_train`) needs the ratings
resident in HBM — impossible at this geometry (31.8 GiB f32).  The
streaming path (`ials_train_events`) assembles every entity's k×k
normal equations from its own events: tile-aligned event panels turn
the nnz·k² Gram work into batched MXU matmuls, so the sweep cost scales
with events, not cells.

Self-checks (r4 verdict asked for quality anchors, not just
``loss_decreased``):

* exact full iALS objective decreases 1 -> EPOCHS epochs (ALS
  monotonicity; computable without the dense block via
  ``tr((XᵀX)(YᵀY))`` + an O(nnz) event correction);
* HR@10 / NDCG@10 on a 1-event-per-user holdout at Netflix scale,
  with the popularity baseline on the identical split for context;
* DENSE-TIER ANCHOR at ML-10M geometry, where both solvers run: the
  streaming solve must reproduce the dense solve's held-out metrics
  (same seed, epochs, reg) — this is the evidence that the
  staged/banded normal equations converge to the same factors at a
  scale where the dense ground truth exists.

Zero-wire staging: the workload regenerates on device (the tunnel's
bulk upload collapses below 0.1 MB/s in bad epochs, measured r5).

No published reference number exists at this scale (the reference wraps
the CPU ``implicit`` library; BASELINE.md's iALS rows are ML-1M), so
``vs_baseline`` is null.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/netflix_ials.py

Prints ONE JSON line on stdout (progress on stderr).
"""
import json
import sys
import time

import numpy as np

from polara_tpu.runtime.timing import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from polara_tpu.datasets.synthetic import (ML10M_GEOMETRY, NETFLIX_GEOMETRY,
                                           load_or_make_ml10m,
                                           load_or_make_netflix)
from polara_tpu.ops.implicit import confidence, ials_train, ials_train_events

N_USERS = NETFLIX_GEOMETRY["n_users"]
N_ITEMS = NETFLIX_GEOMETRY["n_items"]
RANK, EPOCHS, REG, TOPK = 50, 15, 0.01, 10
EVENT_SLICES = 25


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def sync(x):
    return np.asarray(x.ravel()[:1])


def device_holdout(rows_d, cols_d, n_users, seed=7):
    """One seeded held-out event per user, entirely on device (rows
    sorted).  Returns (pick, hold_items)."""
    ones = jnp.ones_like(rows_d)
    counts = jax.ops.segment_sum(ones, rows_d, num_segments=n_users,
                                 indices_are_sorted=True)
    start = jnp.cumsum(counts) - counts
    u = jax.random.uniform(jax.random.key(seed), (n_users,))
    pick = (start + jnp.floor(u * counts).astype(counts.dtype)
            ).astype(jnp.int32)
    return pick, cols_d[pick]


def topk_metrics(user_panel, item_panel, bits, hold_items, n_items):
    """HR@TOPK / NDCG@TOPK of ``user_panel @ item_panelᵀ`` under seen
    filtering, scalars only leaving the device."""
    from polara_tpu.ops.pallas import fused_score_topk

    @jax.jit
    def run(user_panel, item_panel, bits, target):
        recs = fused_score_topk(user_panel, item_panel, bits, TOPK,
                                filter_seen=True, n_valid_cols=n_items)
        hit = recs == target[:, None]
        found = hit.any(axis=1)
        rank = jnp.where(found, jnp.argmax(hit, axis=1) + 1, 0)
        hr = jnp.mean(found)
        ndcg = jnp.mean(jnp.where(
            found, 1.0 / jnp.log2(1.0 + jnp.maximum(rank, 1)), 0.0))
        return jnp.stack([hr, ndcg]), recs

    (vec, recs) = run(user_panel, item_panel, bits, hold_items)
    vec = np.asarray(vec)
    return float(vec[0]), float(vec[1]), recs


def exact_loss(x, y, rows_d, cols_d, cm1_d, reg):
    """Exact confidence-weighted objective without the dense block."""
    base = jnp.trace((x.T @ x) @ (y.T @ y))        # sum_cells (x.y)^2

    nnz = rows_d.shape[0]
    step = -(-nnz // EVENT_SLICES)
    pad = EVENT_SLICES * step - nnz
    rows_p = jnp.concatenate([rows_d, jnp.zeros((pad,), rows_d.dtype)])
    cols_p = jnp.concatenate([cols_d, jnp.zeros((pad,), cols_d.dtype)])
    cm1_p = jnp.concatenate([cm1_d, jnp.full((pad,), -1.0, cm1_d.dtype)])

    @jax.jit
    def correction(x, y, rows_p, cols_p, cm1_p):
        def body(acc, sl):
            r, c, w = sl
            valid = w > 0       # pads AND zeroed holdout events drop out
            dot = jnp.einsum("ek,ek->e", x[r], y[c])
            w = jnp.where(valid, w, 0.0)
            # event cells: c=(1+w), p=1 -> (1+w)(1-dot)^2; baseline
            # counted them as dot^2
            term = jnp.where(valid,
                             (1.0 + w) * (1.0 - dot) ** 2 - dot ** 2, 0.0)
            return acc + jnp.sum(term), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((), x.dtype),
            (rows_p.reshape(EVENT_SLICES, -1),
             cols_p.reshape(EVENT_SLICES, -1),
             cm1_p.reshape(EVENT_SLICES, -1)))
        return acc

    corr = correction(x, y, rows_p, cols_p, cm1_p)
    penalty = reg * (jnp.sum(x * x) + jnp.sum(y * y))
    return float(base + corr + penalty)


def ml10m_anchor():
    """Dense-tier anchor: at ML-10M geometry both solvers run — the
    streaming banded solve must reproduce the dense solve's held-out
    metrics on the identical split (same seed/epochs/reg)."""
    from polara_tpu.ops.pallas import (clear_seen_bits_device,
                                       pack_seen_bits_device)
    from polara_tpu.ops.sparse import CooMatrix

    m, n = ML10M_GEOMETRY["n_users"], ML10M_GEOMETRY["n_items"]
    rows_d, cols_d, vals_d = load_or_make_ml10m(log=log, device=True)
    sync(vals_d)
    pick, hold_items = device_holdout(rows_d, cols_d, m)
    vals_train = vals_d.at[pick].set(0.0)   # zero conf == removed event

    log("ml10m anchor: dense iALS")
    t0 = time.perf_counter()
    dense = CooMatrix(rows_d, cols_d, vals_train, (m, n)).to_dense()
    res_dense = jax.block_until_ready(
        ials_train(dense, RANK, reg=REG, num_epochs=EPOCHS, seed=0))
    t_dense = time.perf_counter() - t0
    log(f"  {t_dense:.1f}s")

    log("ml10m anchor: streaming iALS (same split/seed)")
    t0 = time.perf_counter()
    res_stream = jax.block_until_ready(
        ials_train_events(rows_d, cols_d, vals_train, (m, n), RANK,
                          reg=REG, num_epochs=EPOCHS, seed=0))
    t_stream = time.perf_counter() - t0
    log(f"  {t_stream:.1f}s")

    bits = clear_seen_bits_device(
        pack_seen_bits_device(rows_d, cols_d, m, n),
        rows_d[pick], hold_items)
    hr_d, ndcg_d, recs_d = topk_metrics(res_dense.user, res_dense.item,
                                        bits, hold_items, n)
    hr_s, ndcg_s, recs_s = topk_metrics(res_stream.user, res_stream.item,
                                        bits, hold_items, n)
    overlap = float(jnp.mean(jnp.sum(
        (recs_d[:, :, None] == recs_s[:, None, :])
        & (recs_d >= 0)[:, :, None], axis=(1, 2)) / TOPK))
    log(f"ml10m anchor: dense HR@{TOPK} {hr_d:.5f} NDCG {ndcg_d:.5f} | "
        f"streaming HR {hr_s:.5f} NDCG {ndcg_s:.5f} | "
        f"top-{TOPK} overlap {overlap:.5f}")
    return {
        "ml10m_anchor_hr10_dense": round(hr_d, 6),
        "ml10m_anchor_hr10_streaming": round(hr_s, 6),
        "ml10m_anchor_ndcg10_dense": round(ndcg_d, 6),
        "ml10m_anchor_ndcg10_streaming": round(ndcg_s, 6),
        "ml10m_anchor_metric_delta": round(
            max(abs(hr_d - hr_s), abs(ndcg_d - ndcg_s)), 6),
        "ml10m_anchor_top10_overlap": round(overlap, 6),
        "ml10m_anchor_dense_s": round(t_dense, 1),
        "ml10m_anchor_streaming_s": round(t_stream, 1),
    }


def main():
    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    rows_d, cols_d, vals_d = load_or_make_netflix(log=log, device=True)
    sync(vals_d)
    nnz = int(rows_d.shape[0])
    log(f"calibrated Netflix regenerated on device: {nnz} events "
        f"({time.perf_counter() - t0:.1f}s)")

    pick, hold_items = device_holdout(rows_d, cols_d, N_USERS)
    vals_train = vals_d.at[pick].set(0.0)

    def train(num_epochs):
        return ials_train_events(rows_d, cols_d, vals_train,
                                 (N_USERS, N_ITEMS), RANK, reg=REG,
                                 num_epochs=num_epochs, seed=0)

    t0 = time.perf_counter()
    result = train(EPOCHS)
    sync(result.user)
    log(f"warm-up (staging + compile + {EPOCHS} epochs): "
        f"{time.perf_counter() - t0:.1f}s")

    timings = []
    for i in range(2):
        t0 = time.perf_counter()
        result = train(EPOCHS)
        sync(result.user)
        timings.append(time.perf_counter() - t0)
        log(f"run {i}: {timings[-1]:.2f}s ({EPOCHS} epochs incl. staging)")
    best = min(timings)

    cm1_train = confidence(vals_train)
    loss_1 = exact_loss(*(train(1)), rows_d, cols_d, cm1_train, REG)
    loss_full = exact_loss(result.user, result.item, rows_d, cols_d,
                           cm1_train, REG)
    log(f"exact objective (train split): 1 epoch {loss_1:.6e} -> "
        f"{EPOCHS} epochs {loss_full:.6e}")

    # ---- holdout metrics at Netflix scale + popularity baseline -------
    from polara_tpu.ops.pallas import (clear_seen_bits_device,
                                       pack_seen_bits_device)
    bits = clear_seen_bits_device(
        pack_seen_bits_device(rows_d, cols_d, N_USERS, N_ITEMS),
        rows_d[pick], hold_items)
    hr, ndcg, _ = topk_metrics(result.user, result.item, bits,
                               hold_items, N_ITEMS)
    log(f"holdout HR@{TOPK} {hr:.5f} NDCG@{TOPK} {ndcg:.5f}")

    # popularity baseline on the identical split: rank-1 panels turn the
    # fused kernel into a popularity scorer (same masking semantics)
    counts = jax.ops.segment_sum(
        (vals_train > 0).astype(jnp.float32), cols_d,
        num_segments=N_ITEMS)
    mp_user = jnp.ones((N_USERS, 1), jnp.float32)
    mp_item = counts[:, None]
    hr_mp, ndcg_mp, _ = topk_metrics(mp_user, mp_item, bits, hold_items,
                                     N_ITEMS)
    log(f"popularity baseline HR@{TOPK} {hr_mp:.5f} NDCG@{TOPK} "
        f"{ndcg_mp:.5f}")

    anchor = ml10m_anchor()

    print(json.dumps({
        "metric": "netflix_ials50_15epochs_train",
        "value": round(best, 3),
        "unit": "s",
        "vs_baseline": None,
        "nnz": nnz,
        "epochs": EPOCHS,
        "loss_epoch1": round(loss_1, 2),
        "loss_final": round(loss_full, 2),
        "loss_decreased": bool(loss_full < loss_1),
        "events_per_sec": round(nnz * EPOCHS * 2 / best),
        "hr10": round(hr, 6),
        "ndcg10": round(ndcg, 6),
        "hr10_popularity": round(hr_mp, 6),
        "ndcg10_popularity": round(ndcg_mp, 6),
        **anchor,
    }))


if __name__ == "__main__":
    main()
