"""BPR at ML-10M geometry on ONE chip: train time, sampled-pairs/s, AUC
curve, and holdout HR@10/MRR@10/NDCG@10 against iALS, PureSVD and the
popularity baseline on the IDENTICAL split.

The reference ships BPR as a first-class zoo member through the
``implicit`` CPU wrapper (``polara/recommender/external/bprwrapper.py:
7-76``); this repo's native BPR (``ops/implicit.py:bpr_train``, sampled
triples, batched SGD inside ``lax.scan``) had correctness tests but no
recorded numbers at any scale before r5 (r4 verdict item 3).

Epoch ladder: BPR quality is epoch-hungry; the benchmark trains one
model per rung REUSING the previous rung's factors (warm continuation),
so the ladder costs one long run, and records the full rung table —
the pick is the best holdout HR, not the last rung.

Zero-wire staging: the workload regenerates on device.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bpr_quality.py

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

from polara_tpu.datasets.synthetic import ML10M_GEOMETRY, load_or_make_ml10m
from polara_tpu.ops.implicit import ImplicitFactors, bpr_train, ials_train

N_USERS = ML10M_GEOMETRY["n_users"]
N_ITEMS = ML10M_GEOMETRY["n_items"]
RANK, TOPK, REG = 50, 10, 0.01
BPR_LR, BPR_BATCH = 0.05, 4096
EPOCH_LADDER = (10, 30, 60)
IALS_EPOCHS = 15


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def sync(x):
    return np.asarray(x.ravel()[:1])


def device_holdout(rows_d, cols_d, n_users, seed=7):
    """One seeded held-out event per user, entirely on device (rows
    sorted)."""
    ones = jnp.ones_like(rows_d)
    counts = jax.ops.segment_sum(ones, rows_d, num_segments=n_users,
                                 indices_are_sorted=True)
    start = jnp.cumsum(counts) - counts
    u = jax.random.uniform(jax.random.key(seed), (n_users,))
    pick = (start + jnp.floor(u * counts).astype(counts.dtype)
            ).astype(jnp.int32)
    return pick, cols_d[pick]


def topk_metrics(user_panel, item_panel, bits, hold_items, n_items):
    """HR/MRR/NDCG@TOPK of ``user_panel @ item_panelᵀ`` under seen
    filtering — scalars only leave the device."""
    from polara_tpu.ops.pallas import fused_score_topk

    @jax.jit
    def run(user_panel, item_panel, bits, target):
        recs = fused_score_topk(user_panel, item_panel, bits, TOPK,
                                filter_seen=True, n_valid_cols=n_items)
        hit = recs == target[:, None]
        found = hit.any(axis=1)
        rank = jnp.where(found, jnp.argmax(hit, axis=1) + 1, 1)
        hr = jnp.mean(found)
        mrr = jnp.mean(jnp.where(found, 1.0 / rank, 0.0))
        ndcg = jnp.mean(jnp.where(found, 1.0 / jnp.log2(1.0 + rank), 0.0))
        return jnp.stack([hr, mrr, ndcg])

    vec = np.asarray(run(user_panel, item_panel, bits, hold_items))
    return {"hr10": round(float(vec[0]), 6),
            "mrr10": round(float(vec[1]), 6),
            "ndcg10": round(float(vec[2]), 6)}


def main():
    log(f"devices: {jax.devices()}")
    rows_d, cols_d, vals_d = load_or_make_ml10m(log=log, device=True)
    sync(vals_d)
    nnz = int(rows_d.shape[0])
    log(f"calibrated ML-10M on device: {nnz} events")

    pick, hold_items = device_holdout(rows_d, cols_d, N_USERS)
    vals_train = vals_d.at[pick].set(0.0)
    # BPR/iALS train on the event set; the held-out event must not be a
    # positive — drop it by compacting the stream on device
    keep_n = nnz - N_USERS
    keep_mask = jnp.ones((nnz,), bool).at[pick].set(False)
    keep_idx = jnp.nonzero(keep_mask, size=keep_n)[0]
    rows_t, cols_t = rows_d[keep_idx], cols_d[keep_idx]

    from polara_tpu.ops.pallas import (clear_seen_bits_device,
                                       pack_seen_bits_device)
    bits = clear_seen_bits_device(
        pack_seen_bits_device(rows_d, cols_d, N_USERS, N_ITEMS),
        rows_d[pick], hold_items)

    # ---- BPR epoch ladder (warm continuation between rungs) -----------
    from polara_tpu.ops.implicit import _bpr_epoch
    import math

    seen = jnp.zeros((N_USERS, N_ITEMS), bool).at[rows_t, cols_t].set(True)
    key = jax.random.key(0)
    key, ku, ki = jax.random.split(key, 3)
    scale = 1.0 / math.sqrt(RANK)
    x = jax.random.normal(ku, (N_USERS, RANK), jnp.float32) * scale
    y = jax.random.normal(ki, (N_ITEMS, RANK), jnp.float32) * scale
    n_steps = max(1, -(-keep_n // BPR_BATCH))

    ladder, aucs_all = [], []
    done_epochs, train_s = 0, 0.0
    for rung in EPOCH_LADDER:
        t0 = time.perf_counter()
        rung_aucs = []
        for _ in range(rung - done_epochs):
            key, key_epoch = jax.random.split(key)
            x, y, auc = _bpr_epoch(x, y, seen, rows_t, cols_t, key_epoch,
                                   n_steps=n_steps, batch_size=BPR_BATCH,
                                   lr=BPR_LR, reg=REG)
            rung_aucs.append(auc)
        sync(x)
        train_s += time.perf_counter() - t0
        done_epochs = rung
        aucs = np.asarray(jnp.stack(rung_aucs)).astype(float)
        aucs_all.extend(aucs.tolist())
        m = topk_metrics(x, y, bits, hold_items, N_ITEMS)
        ladder.append({"epochs": rung, "train_s": round(train_s, 1),
                       "batch_auc": round(float(aucs[-1]), 4), **m})
        log(f"bpr @{rung} epochs: {train_s:.1f}s, batch AUC "
            f"{aucs[-1]:.4f}, HR@{TOPK} {m['hr10']:.5f}, "
            f"MRR {m['mrr10']:.5f}")
    best_rung = max(ladder, key=lambda r: r["hr10"])
    pairs_per_sec = round(done_epochs * n_steps * BPR_BATCH / train_s)

    # ---- iALS on the identical split -----------------------------------
    from polara_tpu.ops.sparse import CooMatrix
    t0 = time.perf_counter()
    dense = CooMatrix(rows_d, cols_d, vals_train,
                      (N_USERS, N_ITEMS)).to_dense()
    ials = ials_train(dense, RANK, reg=REG, num_epochs=IALS_EPOCHS, seed=0)
    sync(ials.user)
    t_ials = time.perf_counter() - t0
    m_ials = topk_metrics(ials.user, ials.item, bits, hold_items, N_ITEMS)
    log(f"ials @{IALS_EPOCHS} epochs: {t_ials:.1f}s, "
        f"HR@{TOPK} {m_ials['hr10']:.5f}")

    # ---- PureSVD rank 50 on the identical split -------------------------
    from polara_tpu.ops.rsvd import randomized_svd
    from polara_tpu.ops.sparse import dense_power_operator
    t0 = time.perf_counter()
    svd = randomized_svd(dense, RANK, n_iter=6, seed=0, dtype=jnp.float32,
                         power_operator=dense_power_operator(dense))
    proj = dense @ svd.v
    sync(proj)
    t_svd = time.perf_counter() - t0
    m_svd = topk_metrics(proj, svd.v, bits, hold_items, N_ITEMS)
    log(f"puresvd50: {t_svd:.1f}s, HR@{TOPK} {m_svd['hr10']:.5f}")

    # ---- popularity baseline -------------------------------------------
    counts = jax.ops.segment_sum((vals_train > 0).astype(jnp.float32),
                                 cols_d, num_segments=N_ITEMS)
    m_mp = topk_metrics(jnp.ones((N_USERS, 1), jnp.float32),
                        counts[:, None], bits, hold_items, N_ITEMS)
    log(f"popularity: HR@{TOPK} {m_mp['hr10']:.5f}")

    print(json.dumps({
        "metric": "ml10m_bpr50_train_to_best_rung",
        "value": best_rung["train_s"],
        "unit": "s",
        "vs_baseline": None,
        "nnz": nnz,
        "rank": RANK,
        "lr": BPR_LR,
        "batch_size": BPR_BATCH,
        "sampled_pairs_per_sec": pairs_per_sec,
        "epoch_ladder": ladder,
        "best_epochs": best_rung["epochs"],
        "auc_first": round(aucs_all[0], 4),
        "auc_last": round(aucs_all[-1], 4),
        "auc_increased": bool(aucs_all[-1] > aucs_all[0]),
        "bpr": {k: best_rung[k] for k in ("hr10", "mrr10", "ndcg10")},
        "ials": {**m_ials, "train_s": round(t_ials, 1),
                 "epochs": IALS_EPOCHS},
        "puresvd": {**m_svd, "build_s": round(t_svd, 1)},
        "popularity": m_mp,
    }))


if __name__ == "__main__":
    main()
