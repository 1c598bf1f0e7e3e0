"""On-chip A/B of the fused kernel's tile-skip merge guard (r4 verdict
item 7) at ML-10M geometry.

The fused scoring pass is VPU-select-bound: the MXU score matmul is
~2 ms of the ~40 ms phase, the k-pass max-select merge the rest
(docs/PERFORMANCE.md).  ``tile_skip=True`` guards the merge with a
per-tile ``any(max(scores) > kth_best)`` check (`ops/pallas.py`): once
every user's carry holds k scores no tile can beat, the merge collapses
to one (U, TILE_N) reduction.  How often that fires depends on where
the high-score items sit in the catalog — so the A/B runs three arms:

* ``base``  — tile_skip off (the shipped r4 behaviour);
* ``skip``  — tile_skip on, catalog order as-is;
* ``skip_pop`` — tile_skip on with the item panel permuted by
  descending popularity (carry warms up in the first tiles, the tail
  merges should all skip).  Output indices are mapped back through the
  permutation; ties resolve to the most-popular rather than the
  lowest-index item, so this arm is a measurement probe, not a shipped
  default.

Parity is asserted on-device between base and skip before timing.
Timing is interleaved (base/skip/base/skip...) per k, min-of-5, with a
device-complete sync on a 4-byte output corner and a varied input
element per iteration (tunnel dispatch is fully async; see CLAUDE.md).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tile_skip_ab.py

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
from polara_tpu.ops.pallas import fused_score_topk, pack_seen_bits_device
from polara_tpu.ops.rsvd import randomized_svd
from polara_tpu.ops.sparse import CooMatrix, dense_power_operator

N_USERS = ML10M_GEOMETRY["n_users"]
N_ITEMS = ML10M_GEOMETRY["n_items"]
RANK = 50
KS = (10, 64, 100, 128)
REPS = 5


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def time_variant(proj, items, bits, k, **kw):
    """Min-of-REPS wall time of one fused call, device-complete."""
    out = fused_score_topk(proj, items, bits, k, n_valid_cols=N_ITEMS, **kw)
    np.asarray(out[-1:, -1:])                      # compile + settle
    best = np.inf
    for i in range(REPS):
        p = proj.at[0, 0].add(1e-7 * (i + 1))      # defeat any result reuse
        t0 = time.perf_counter()
        out = fused_score_topk(p, items, bits, k, n_valid_cols=N_ITEMS,
                               **kw)
        np.asarray(out[-1:, -1:])                  # 4-byte completion sync
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    log(f"devices: {jax.devices()}")
    rows_d, cols_d, vals_d = load_or_make_ml10m(log=log, device=True)
    np.asarray(vals_d.ravel()[:1])
    log(f"ML-10M on device: {rows_d.shape[0]} events")

    dense = CooMatrix(rows_d, cols_d, vals_d, (N_USERS, N_ITEMS)).to_dense()
    svd = randomized_svd(dense, RANK, n_iter=6, seed=0, dtype=jnp.float32,
                         power_operator=dense_power_operator(dense))
    proj = dense @ svd.v
    items = svd.v
    bits = pack_seen_bits_device(rows_d, cols_d, N_USERS, N_ITEMS)
    np.asarray(proj.ravel()[:1])
    log("rank-50 factors + seen bits staged")

    # popularity permutation arm: counts, descending order, inverse map
    counts = jax.ops.segment_sum(jnp.ones_like(vals_d), cols_d,
                                 num_segments=N_ITEMS)
    perm = jnp.argsort(-counts).astype(jnp.int32)        # new -> old
    items_pop = items[perm]
    inv = jnp.zeros((N_ITEMS,), jnp.int32).at[perm].set(
        jnp.arange(N_ITEMS, dtype=jnp.int32))            # old -> new
    bits_pop = pack_seen_bits_device(rows_d, inv[cols_d], N_USERS, N_ITEMS)
    head_share = float(jnp.sum(jnp.sort(counts)[-N_ITEMS // 10:])
                       / jnp.sum(counts))
    asis_share = float(jnp.sum(counts[:N_ITEMS // 10]) / jnp.sum(counts))
    log(f"top-10%-items event share: sorted {head_share:.3f}, "
        f"as-is catalog order {asis_share:.3f}")

    # parity gate (base vs skip must be bit-identical; pop arm maps back)
    k0 = 10
    r_base = fused_score_topk(proj, items, bits, k0, n_valid_cols=N_ITEMS)
    r_skip = fused_score_topk(proj, items, bits, k0, n_valid_cols=N_ITEMS,
                              tile_skip=True)
    parity = bool(np.asarray(jnp.array_equal(r_base, r_skip)))
    r_pop = fused_score_topk(proj, items_pop, bits_pop, k0,
                             n_valid_cols=N_ITEMS, tile_skip=True)
    r_pop_mapped = jnp.where(r_pop >= 0, perm[jnp.maximum(r_pop, 0)], r_pop)
    pop_overlap = float(np.asarray(jnp.mean(jnp.sum(
        (r_base[:, :, None] == r_pop_mapped[:, None, :])
        & (r_base >= 0)[:, :, None], axis=(1, 2)) / k0)))
    log(f"parity base==skip: {parity}; pop-arm top-10 set overlap vs "
        f"base: {pop_overlap:.5f} (ties re-ordered by design)")

    table = []
    for k in KS:
        t_base = time_variant(proj, items, bits, k)
        t_skip = time_variant(proj, items, bits, k, tile_skip=True)
        t_pop = time_variant(proj, items_pop, bits_pop, k, tile_skip=True)
        # re-interleave once to bound drift
        t_base = min(t_base, time_variant(proj, items, bits, k))
        row = {"k": k, "base_ms": round(t_base * 1e3, 1),
               "skip_ms": round(t_skip * 1e3, 1),
               "skip_pop_ms": round(t_pop * 1e3, 1),
               "speedup_skip": round(t_base / t_skip, 3),
               "speedup_skip_pop": round(t_base / t_pop, 3)}
        table.append(row)
        log(f"k={k}: base {row['base_ms']}ms skip {row['skip_ms']}ms "
            f"pop+skip {row['skip_pop_ms']}ms "
            f"({row['speedup_skip']}x / {row['speedup_skip_pop']}x)")

    k10 = table[0]
    print(json.dumps({
        "metric": "ml10m_fused_topk_tile_skip_ab",
        "value": k10["skip_ms"],
        "unit": "ms",
        "vs_baseline": None,
        "parity_base_eq_skip": parity,
        "pop_arm_top10_set_overlap": round(pop_overlap, 6),
        "top10pct_event_share_sorted": round(head_share, 4),
        "top10pct_event_share_asis": round(asis_share, 4),
        "reps_min_of": REPS,
        "table": table,
    }))


if __name__ == "__main__":
    main()
