"""Netflix-prize scale iALS (480,189 x 17,770, ~98M events) on ONE chip
through the streaming tile-aligned event sweeps.

The dense-block iALS (`ops/implicit.py:ials_train`) needs the ratings
resident in HBM — impossible at this geometry (31.8 GiB f32).  The
streaming path (`ials_train_events`) assembles every entity's k×k
normal equations from its own events: tile-aligned event panels turn
the nnz·k² Gram work into batched MXU matmuls, so the sweep cost scales
with events, not cells.

Self-check: the exact full iALS objective
``sum_ui c_ui (p_ui - x_u.y_i)^2 + reg(|X|^2+|Y|^2)`` decomposes into
``tr((X^T X)(Y^T Y))`` plus an O(nnz) event correction — computable
exactly without the dense block.  The benchmark asserts it decreases
from the 1-epoch to the full model (ALS monotonicity).

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

from polara_tpu.datasets.synthetic import NETFLIX_GEOMETRY, load_or_make_netflix
from polara_tpu.ops.implicit import confidence, ials_train_events

N_USERS = NETFLIX_GEOMETRY["n_users"]
N_ITEMS = NETFLIX_GEOMETRY["n_items"]
RANK, EPOCHS, REG = 50, 15, 0.01
EVENT_SLICES = 25


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def exact_loss(x, y, rows_d, cols_d, cm1_d, reg):
    """Exact confidence-weighted objective without the dense block."""
    k = x.shape[1]
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
            valid = w >= 0
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


def main():
    log(f"devices: {jax.devices()}")
    rows, cols, vals = load_or_make_netflix(log=log)
    nnz = len(rows)
    log(f"calibrated Netflix: {nnz} events, {N_USERS}x{N_ITEMS}")

    # the event stream rides the ~30 MB/s tunnel once, outside timing —
    # the metric is training (staging + sweeps), not host->device wire
    t0 = time.perf_counter()
    rows, cols, vals = (jax.block_until_ready(jnp.asarray(a, d))
                        for a, d in ((rows, jnp.int32), (cols, jnp.int32),
                                     (vals, jnp.float32)))
    log(f"event stream -> device: {time.perf_counter() - t0:.1f}s")

    def train(num_epochs):
        return ials_train_events(rows, cols, vals, (N_USERS, N_ITEMS),
                                 RANK, reg=REG, num_epochs=num_epochs,
                                 seed=0)

    t0 = time.perf_counter()
    result = jax.block_until_ready(train(EPOCHS))
    log(f"warm-up (staging + compile + {EPOCHS} epochs): "
        f"{time.perf_counter() - t0:.1f}s")

    timings = []
    for i in range(2):
        t0 = time.perf_counter()
        result = jax.block_until_ready(train(EPOCHS))
        timings.append(time.perf_counter() - t0)
        log(f"run {i}: {timings[-1]:.2f}s ({EPOCHS} epochs incl. staging)")
    best = min(timings)

    rows_d = jnp.asarray(rows, jnp.int32)
    cols_d = jnp.asarray(cols, jnp.int32)
    cm1_d = confidence(jnp.asarray(vals, jnp.float32))
    loss_1 = exact_loss(*jax.block_until_ready(train(1)), rows_d, cols_d,
                        cm1_d, REG)
    loss_full = exact_loss(result.user, result.item, rows_d, cols_d,
                           cm1_d, REG)
    log(f"exact objective: 1 epoch {loss_1:.6e} -> {EPOCHS} epochs "
        f"{loss_full:.6e}")

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
    }))


if __name__ == "__main__":
    main()
