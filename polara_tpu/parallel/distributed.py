"""Multi-chip training and scoring (new capability vs the reference).

The reference is a single-process CPU library whose only parallelism is a
thread pool over test-user slices (``polara/recommender/models.py:374-405``)
— SURVEY.md §2.9/§5.8.  Here the same workloads scale over a
``jax.sharding.Mesh``:

* **scoring** — test-user rows shard over the ``users`` axis; scoring is
  embarrassingly parallel, the only collective is the final metric psum;
* **randomized SVD build** — the ratings matrix shards by rows.  Tall-skinny
  QR does not SPMD well, so orthogonalization uses **CholeskyQR2**: the
  b×b Gram matrix is a ``psum`` over row shards, its Cholesky factor is
  tiny and replicated, and the panel update is a local matmul.  Two passes
  restore the orthogonality QR would give (Fukaya et al.), and every flop
  lands on the MXU.

All collectives are inserted by GSPMD from sharding annotations and ride
ICI within a slice.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from polara_tpu.ops.rsvd import SvdResult, cholesky_qr2
from polara_tpu.ops.topk import mask_and_topk


@partial(jax.jit, static_argnames=("n_iter", "k"))
def _dist_rsvd_iterations(r_matrix: jax.Array, omega: jax.Array,
                          n_iter: int, k: int) -> SvdResult:
    q, _ = cholesky_qr2(r_matrix @ omega)
    for _ in range(n_iter):
        z, _ = cholesky_qr2(r_matrix.T @ q)
        q, _ = cholesky_qr2(r_matrix @ z)
    b = q.T @ r_matrix                    # (block, n)
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    return SvdResult(u=(q @ ub)[:, :k], s=s[:k], v=vt[:k, :].T)


def distributed_randomized_svd(r_matrix: jax.Array, k: int,
                               mesh: Mesh,
                               oversample: Optional[int] = None,
                               n_iter: int = 8,
                               seed: int = 0) -> SvdResult:
    """Rank-k truncated SVD of a dense ratings matrix sharded by rows.

    ``r_matrix`` is placed with rows over the mesh ``users`` axis; the
    k-wide panels stay replicated (they are tiny next to R).  GSPMD turns
    the Gram products into psums over ICI.
    """
    m, n = r_matrix.shape
    block = min(k + (oversample if oversample is not None else max(10, k)),
                min(m, n))
    users_axis = mesh.axis_names[0]
    r_matrix = jax.device_put(
        r_matrix, NamedSharding(mesh, P(users_axis, None)))
    omega = jax.device_put(
        jax.random.normal(jax.random.key(seed), (n, block),
                          dtype=r_matrix.dtype),
        NamedSharding(mesh, P()))
    return _dist_rsvd_iterations(r_matrix, omega, n_iter, k)


@partial(jax.jit, static_argnames=("topk",))
def score_mask_topk_step(item_factors: jax.Array, profiles: jax.Array,
                         seen_rows: jax.Array, seen_cols: jax.Array,
                         seen_valid: jax.Array, topk: int) -> jax.Array:
    """One fused inference step: ``(P·V)·Vᵀ`` → downvote seen → top-k.

    ``profiles`` rows may be sharded over the ``users`` mesh axis; factors
    replicate.  This is the flagship forward step exposed via
    ``__graft_entry__``.
    """
    scores = (profiles @ item_factors) @ item_factors.T
    return mask_and_topk(scores, seen_rows, seen_cols, seen_valid, topk)


class TrainEvalStepResult(NamedTuple):
    factors: SvdResult
    recommendations: jax.Array
    hit_count: jax.Array


@partial(jax.jit, static_argnames=("n_iter", "k", "topk"))
def full_train_step(r_train: jax.Array, omega: jax.Array,
                    profiles: jax.Array, seen_rows: jax.Array,
                    seen_cols: jax.Array, seen_valid: jax.Array,
                    holdout_items: jax.Array, n_iter: int, k: int,
                    topk: int) -> TrainEvalStepResult:
    """Full distributed pipeline step: factorize → score → top-k → HR psum.

    Everything downstream of the sharded inputs is one XLA program; GSPMD
    inserts the collectives (Gram psums in CholeskyQR2, final hit-count
    reduction).
    """
    factors = _dist_rsvd_iterations(r_train, omega, n_iter, k)
    recs = score_mask_topk_step(factors.v, profiles, seen_rows, seen_cols,
                                seen_valid, topk)
    hits = (recs == holdout_items[:, None]).any(axis=1)
    return TrainEvalStepResult(factors=factors,
                               recommendations=recs,
                               hit_count=jnp.sum(hits))


def distributed_ials(dense_ratings: jax.Array, rank: int, mesh: Mesh,
                     alpha: float = 1.0, weight="log2",
                     epsilon: float = 1.0, reg: float = 0.01,
                     num_epochs: int = 15, seed: Optional[int] = 0,
                     batch_rows: Optional[int] = 64, dtype=jnp.float32,
                     train_stats: Optional[dict] = None):
    """Confidence-weighted ALS over a row-sharded ratings matrix.

    HBM-lean formulation: only ONE row(user)-sharded copy of the
    confidence block is ever resident — the item half-sweep assembles its
    normal systems from per-shard partials instead of materializing a
    transposed copy (which would halve the largest trainable problem).
    Per epoch:

    * user systems solve shard-locally against the replicated item panel
      (no collective);
    * item systems: each shard contributes its users' weighted grams
      ``Σ_u c_ui x_u x_uᵀ`` and rhs ``Σ_u (c_ui+1)·p_ui x_u``; a
      ``psum_scatter`` over the users axis both reduces them and hands
      every shard its own item slice (traffic-optimal: each device
      receives only n_items/n_dev systems), the slice solves locally and
      ``all_gather``s back into the replicated panel.

    The gram-building einsum — the O(n_users·n_items·k²) bulk of the
    sweep — shards perfectly over users, so compute AND memory both scale
    with the mesh.  Numerically identical to
    :func:`polara_tpu.ops.implicit.ials_train` up to float reduction
    order.

    ``train_stats``: optional dict populated with per-epoch wall seconds
    and a per-epoch collective-traffic estimate (bytes entering each
    device), so scaling regressions are visible from the dryrun.
    """
    import math
    import time

    from jax import shard_map

    from polara_tpu.ops.implicit import (ImplicitFactors, confidence,
                                         ials_half_sweep)

    users_axis = mesh.axis_names[0]
    n_dev = mesh.shape[users_axis]
    row_sharding = NamedSharding(mesh, P(users_axis, None))
    repl = NamedSharding(mesh, P())

    cm1 = confidence(dense_ratings.astype(dtype), alpha, weight,
                     epsilon)
    n_users, n_items = cm1.shape
    if batch_rows is None:      # auto-size like the single-chip path
        from polara_tpu.ops.implicit import _auto_batch_rows
        batch_rows = _auto_batch_rows(
            max(n_users // n_dev, 1), n_items, rank)
    # shard_map needs the sharded axis divisible by the mesh; zero-pad
    # both entity axes (zero rows solve to zero factors; zero item
    # columns have empty grams, so their regularized systems solve to
    # zero — both sliced off at the end).  The item axis pads to a
    # multiple of batch_rows·n_dev so gram batching and psum_scatter
    # slicing stay aligned.
    pad_u = (-n_users) % n_dev
    pad_i = (-n_items) % (batch_rows * n_dev)
    cm1 = jax.device_put(jnp.pad(cm1, ((0, pad_u), (0, pad_i))),
                         row_sharding)
    ni_p = n_items + pad_i
    eye = reg * jnp.eye(rank, dtype=dtype)

    key = jax.random.key(0 if seed is None else seed)
    item_factors = jax.device_put(
        jnp.pad(jax.random.normal(key, (n_items, rank), dtype)
                * (1.0 / math.sqrt(rank)), ((0, pad_i), (0, 0))), repl)

    def epoch_local(cm1_local, y):
        x_local = ials_half_sweep.__wrapped__(cm1_local, y, reg,
                                              batch_rows)
        # item-side partial normal systems from this shard's users
        gram0 = jax.lax.psum(x_local.T @ x_local, users_axis)
        rhs = jnp.where(cm1_local > 0, cm1_local + 1.0, 0.0).T @ x_local

        def batch_gram(b):
            cm_b = jax.lax.dynamic_slice_in_dim(
                cm1_local, b * batch_rows, batch_rows, axis=1)
            return jnp.einsum("ub,uk,ul->bkl", cm_b, x_local, x_local)

        gram_w = jax.lax.map(batch_gram,
                             jnp.arange(ni_p // batch_rows))
        gram_w = gram_w.reshape(ni_p, rank, rank)
        # reduce partials AND deal each shard its own item slice in one
        # collective
        gram_l = jax.lax.psum_scatter(gram_w, users_axis,
                                      scatter_dimension=0, tiled=True)
        rhs_l = jax.lax.psum_scatter(rhs, users_axis,
                                     scatter_dimension=0, tiled=True)
        a_l = gram0[None] + eye[None] + gram_l
        chol = jax.scipy.linalg.cho_factor(a_l)
        v_l = jax.scipy.linalg.cho_solve(chol, rhs_l[..., None])[..., 0]
        y_new = jax.lax.all_gather(v_l, users_axis, axis=0, tiled=True)
        return x_local, y_new

    epoch = jax.jit(shard_map(
        epoch_local, mesh=mesh,
        in_specs=(P(users_axis, None), P()),
        out_specs=(P(users_axis, None), P()), check_vma=False))

    itemsize = jnp.dtype(dtype).itemsize
    comm_bytes = int(  # per-device received bytes per epoch
        ni_p * rank * rank * itemsize            # gram psum_scatter
        + ni_p * rank * itemsize                 # rhs psum_scatter
        + ni_p * rank * itemsize                 # panel all_gather
        + rank * rank * itemsize * n_dev)        # gram0 psum
    epochs_log = [] if train_stats is not None else None
    user_factors = None
    for _ in range(num_epochs):
        start = time.perf_counter()
        user_factors, item_factors = epoch(cm1, item_factors)
        if epochs_log is not None:
            np.asarray(item_factors[:1, :1])     # honest sync (tunnel-safe)
            epochs_log.append({
                "wall_s": time.perf_counter() - start,
                "comm_bytes": comm_bytes})
    if train_stats is not None:
        train_stats.update(mode="sharded-normal-systems",
                           n_devices=n_dev, epochs=epochs_log)
    return ImplicitFactors(user=user_factors[:n_users],
                           item=item_factors[:n_items])


def distributed_ials_events(rows: np.ndarray, cols: np.ndarray,
                            vals: np.ndarray, shape, rank: int,
                            mesh: Mesh, alpha: float = 1.0,
                            weight="log2", epsilon: float = 1.0,
                            reg: float = 0.01, num_epochs: int = 15,
                            seed: Optional[int] = 0, tile: int = 128,
                            batch_entities: int = 4096,
                            max_window_events: int = 4_000_000,
                            dtype=jnp.float32,
                            train_stats: Optional[dict] = None):
    """Streaming (beyond-HBM) iALS with the event stream sharded over the
    mesh — the multi-chip tier of
    :func:`polara_tpu.ops.implicit.ials_train_events`.

    Entities deal onto devices **strided** (entity ``g`` → device
    ``g % n_dev``, local id ``g // n_dev``) so Zipf-skewed event counts
    balance instead of piling the popular head onto one band; each device
    stages only its own bands' tile-aligned event panels for BOTH sweep
    sides (~``2·nnz/n_dev`` events resident per device).  A half-sweep is
    the same batched-MXU normal-equation solve as the single-chip path
    (:func:`polara_tpu.ops.implicit._ell_half_sweep`), entirely band-local
    against a replicated factor panel; the only collectives are the two
    factor-panel ``all_gather``s per epoch — bytes independent of nnz, so
    both memory and the nnz·k² Gram work scale linearly with the mesh.

    Same init and sweep order as the single-chip streaming path — parity
    is float-reduction-order level (band batching regroups the per-entity
    segment sums).

    ``train_stats``: optional dict populated like
    :func:`distributed_ials`'s (per-epoch wall seconds + per-device
    received collective bytes).
    """
    import math
    import time

    from jax import shard_map

    from polara_tpu.ops.implicit import (ImplicitFactors, _ell_half_sweep,
                                         canonical_weight, confidence,
                                         stage_events_panels,
                                         stage_events_side)

    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    n_users, n_items = (int(s) for s in shape)
    nnz = len(vals)
    if nnz == 0:
        raise ValueError("empty matrix")
    weight = canonical_weight(weight)

    rows_d = jnp.asarray(rows, jnp.int32)
    cols_d = jnp.asarray(cols, jnp.int32)
    cm1 = confidence(jnp.asarray(vals, dtype), alpha, weight, epsilon)

    nl_u = -(-n_users // n_dev)     # local entities per band
    nl_i = -(-n_items // n_dev)
    nu_pad, ni_pad = nl_u * n_dev, nl_i * n_dev

    def stage_banded(maj, minor, w, n_major, n_local):
        """One EllSide per strided band, forced to a common geometry;
        fields stacked on a leading device axis."""
        be = min(batch_entities, n_local)
        order = jnp.argsort(maj, stable=True)
        maj, minor, w = maj[order], minor[order], w[order]
        band = maj % n_dev
        per_band = []
        for b in range(n_dev):
            sel = band == b
            mb = maj[sel] // n_dev
            nb, wb = minor[sel], w[sel]
            if mb.shape[0] == 0:
                # zero-weight placeholder event: keeps staging non-empty,
                # contributes nothing (w=0 zeroes its Gram/rhs terms)
                mb = jnp.zeros((1,), jnp.int32)
                nb = jnp.zeros((1,), jnp.int32)
                wb = jnp.zeros((1,), dtype)
            per_band.append((mb, nb, wb))
        # the expensive device staging (panel gathers) runs ONCE per
        # band; the geometry-forcing fixpoint below restages from these
        # panels at host-plan cost only
        panels = [stage_events_panels(mb, nb, wb, n_local, tile=tile)
                  for mb, nb, wb in per_band]
        first = [stage_events_side(mb, nb, wb, n_local, tile=tile,
                                   batch_entities=be,
                                   max_window_events=max_window_events,
                                   panels=pan)
                 for (mb, nb, wb), pan in zip(per_band, panels)]
        # uniform geometry across bands: all four forcings only inflate
        # (pad-tail tiles are zero-weight, padding batches own zero
        # entities, widened windows are owner-masked, widened segment
        # counts are n_ents-write-masked).  The segment width must be
        # forced FIRST — it feeds the batch-start clamping, so the
        # window/e_pad/batch-count maxima are only fixed points once
        # every band plans at the same ``be_seg``.
        be_seg = max(s.batch_entities for s in first)
        first = [s if s.batch_entities == be_seg
                 else stage_events_side(mb, nb, wb, n_local, tile=tile,
                                        batch_entities=be,
                                        max_window_events=max_window_events,
                                        min_batch_entities=be_seg,
                                        panels=pan)
                 for s, (mb, nb, wb), pan
                 in zip(first, per_band, panels)]
        e_pad = max(s.minor.shape[0] for s in first)
        tb = max(s.owner_local.shape[1] for s in first)
        nb_u = max(s.starts.shape[0] for s in first)
        sides = [s if (s.minor.shape[0] == e_pad
                       and s.owner_local.shape[1] == tb
                       and s.starts.shape[0] == nb_u)
                 else stage_events_side(mb, nb, wb, n_local, tile=tile,
                                        batch_entities=be,
                                        max_window_events=max_window_events,
                                        pad_events_to=e_pad,
                                        window_tiles=tb,
                                        pad_batches_to=nb_u,
                                        min_batch_entities=be_seg,
                                        panels=pan)
                 for s, (mb, nb, wb), pan
                 in zip(first, per_band, panels)]
        dev_sharding = NamedSharding(mesh, P(axis))
        stack = lambda field: jax.device_put(
            jnp.stack([getattr(s, field) for s in sides]), dev_sharding)
        return (stack("minor"), stack("w"), stack("starts"),
                stack("ent_starts"), stack("n_ents"),
                stack("owner_local")), be_seg

    u_arrays, be_u = stage_banded(rows_d, cols_d, cm1, n_users, nl_u)
    i_arrays, be_i = stage_banded(cols_d, rows_d, cm1, n_items, nl_i)

    key = jax.random.key(0 if seed is None else seed)
    repl = NamedSharding(mesh, P())
    item_factors = jax.device_put(
        jnp.pad(jax.random.normal(key, (n_items, rank), dtype)
                * (1.0 / math.sqrt(rank)), ((0, ni_pad - n_items),
                                            (0, 0))), repl)
    reg_d = jnp.asarray(reg, dtype)

    def natural(panel_bm, n_pad):
        # all_gather is band-major: row (b, l) holds entity l*n_dev + b
        k = panel_bm.shape[-1]
        return panel_bm.reshape(n_dev, -1, k).transpose(1, 0, 2)\
                       .reshape(n_pad, k)

    def half(arrays, other, n_local, be):
        minor_p, w_p, starts, ent_starts, n_ents, ol = \
            (a[0] for a in arrays)
        return _ell_half_sweep.__wrapped__(
            minor_p, w_p, starts, ent_starts, n_ents, ol, other, reg_d,
            n_entities=n_local, batch_entities=be, tile=tile)

    def epoch_local(u_arrays, i_arrays, y_full):
        x_local = half(u_arrays, y_full, nl_u, be_u)
        x_full = natural(jax.lax.all_gather(x_local, axis, axis=0,
                                            tiled=True), nu_pad)
        y_local = half(i_arrays, x_full, nl_i, be_i)
        y_full = natural(jax.lax.all_gather(y_local, axis, axis=0,
                                            tiled=True), ni_pad)
        return x_full, y_full

    dev = P(axis)
    epoch = jax.jit(shard_map(
        epoch_local, mesh=mesh,
        in_specs=((dev,) * 6, (dev,) * 6, P()),
        out_specs=(P(), P()), check_vma=False))

    itemsize = jnp.dtype(dtype).itemsize
    comm_bytes = (nu_pad + ni_pad) * rank * itemsize  # 2 panel gathers
    epochs_log = [] if train_stats is not None else None
    user_factors = None
    for _ in range(num_epochs):
        start = time.perf_counter()
        user_factors, item_factors = epoch(u_arrays, i_arrays,
                                           item_factors)
        if epochs_log is not None:
            np.asarray(item_factors[:1, :1])     # honest sync (tunnel-safe)
            epochs_log.append({
                "wall_s": time.perf_counter() - start,
                "comm_bytes": comm_bytes})
    if train_stats is not None:
        train_stats.update(mode="sharded-event-streams",
                           n_devices=n_dev, epochs=epochs_log)
    return ImplicitFactors(user=user_factors[:n_users],
                           item=item_factors[:n_items])


def distributed_bpr(rows: np.ndarray, cols: np.ndarray, shape, rank: int,
                    mesh: Mesh, learning_rate: float = 0.01,
                    reg: float = 0.01, num_epochs: int = 100,
                    batch_size: int = 1024, seed: Optional[int] = 0,
                    dtype=jnp.float32,
                    epoch_stats: Optional[list] = None,
                    update_mode: str = "exact",
                    sync_every: Optional[int] = None,
                    train_stats: Optional[dict] = None):
    """BPR sharded over the mesh, in one of two modes.

    ``update_mode="exact"``: every device draws the SAME per-step batch
    indices (the single-chip sampler's draws, so trajectories match
    :func:`ops.implicit.bpr_train` for the same seed), computes sigmoid
    gradients for its slice, and ``all_gather``s the per-triple gradient
    scalars — ``batch`` floats across ICI per step — before applying the
    identical replicated factor update.  Only the O(batch·rank) gradient
    math shards; the scatter update replicates, which bounds the speedup
    near 2× regardless of mesh size.

    ``update_mode="local"``: local-SGD.  Each device runs an INDEPENDENT
    chain on its own batch_size/n_dev-sized draws (key folded with the
    shard index), applying updates to its own replica, and replicas
    average (``pmean``) every ``sync_every`` steps (default: once per
    epoch).  Both the gradient math AND the scatter update shard, so
    per-device step cost drops n_dev× — epoch sample coverage matches the
    single-chip run (n_dev chains × batch/n_dev draws/step), the
    trajectory does not (parallel SGD averaging), so quality is asserted
    statistically (AUC), not bitwise.  The learning rate linearly scales
    by n_dev internally (Goyal et al.'s rule — replica averaging divides
    each chain's progress by n_dev; measured here: unscaled local mode
    plateaus ~0.49 AUC where single-chip reaches ~0.71, scaled reaches
    ~0.68 on the same budget).

    ``train_stats``: optional dict populated with per-epoch wall seconds
    and a per-device collective-traffic estimate.
    """
    import math
    import time

    from jax import shard_map

    from polara_tpu.ops.implicit import ImplicitFactors

    if update_mode not in ("exact", "local"):
        raise ValueError(f"unknown update_mode {update_mode!r}")
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    if batch_size % n_dev:
        raise ValueError(f"batch_size {batch_size} must divide over "
                         f"{n_dev} devices")
    b_loc = batch_size // n_dev
    n_users, n_items = shape
    nnz = len(rows)

    rows_d = jnp.asarray(rows, jnp.int32)
    cols_d = jnp.asarray(cols, jnp.int32)
    seen = jnp.zeros(shape, bool).at[rows_d, cols_d].set(True)
    repl = NamedSharding(mesh, P())
    seen = jax.device_put(seen, repl)
    rows_d = jax.device_put(rows_d, repl)
    cols_d = jax.device_put(cols_d, repl)

    key = jax.random.key(0 if seed is None else seed)
    key, ku, ki = jax.random.split(key, 3)
    scale = 1.0 / math.sqrt(rank)
    user_factors = jax.device_put(
        jax.random.normal(ku, (n_users, rank), dtype) * scale, repl)
    item_factors = jax.device_put(
        jax.random.normal(ki, (n_items, rank), dtype) * scale, repl)

    lr = learning_rate
    n_steps = max(1, -(-nnz // batch_size))
    if sync_every is None:
        sync_every = n_steps
    n_blocks = max(1, -(-n_steps // sync_every))

    lr_local = lr * n_dev      # linear scaling under replica averaging

    def epoch_local_sgd(x, y, seen_l, rows_l, cols_l, key_epoch):
        # local-SGD mode: independent per-device chains, b_loc-sized
        # draws, pmean sync every sync_every steps.  The key grid rounds
        # n_steps up to full blocks; rounded-up slots carry live=False
        # and run as no-ops so the epoch covers EXACTLY n_steps samples
        # (the single-chip contract) even when sync_every ∤ n_steps.
        shard = jax.lax.axis_index(axis)
        key_dev = jax.random.fold_in(key_epoch, shard)

        def step(carry, inp):
            x, y = carry
            key_step, live = inp
            kp, kn = jax.random.split(key_step)
            idx = jax.random.randint(kp, (b_loc,), 0, nnz)
            j = jax.random.randint(kn, (b_loc,), 0, n_items)
            u, i = rows_l[idx], cols_l[idx]
            ok = ~seen_l[u, j] & live
            xu, yi, yj = x[u], y[i], y[j]
            margin = jnp.sum(xu * (yi - yj), axis=1)
            g = jnp.where(ok, jax.nn.sigmoid(-margin), 0.0)[:, None]
            okf = ok[:, None].astype(x.dtype)
            x = x.at[u].add(lr_local * (g * (yi - yj) - reg * okf * xu))
            y = y.at[i].add(lr_local * (g * xu - reg * okf * yi))
            y = y.at[j].add(lr_local * (-g * xu - reg * okf * yj))
            auc = jnp.sum(jnp.where(ok, margin > 0, False)) \
                / jnp.maximum(jnp.sum(ok), 1)
            return (x, y), (auc, live.astype(x.dtype))

        def block(carry, inp):
            (x, y), (aucs, lives) = jax.lax.scan(step, carry, inp)
            x = jax.lax.pmean(x, axis)
            y = jax.lax.pmean(y, axis)
            return (x, y), (jnp.sum(aucs), jnp.sum(lives))

        total = n_blocks * sync_every
        keys = jax.random.split(key_dev, total) \
            .reshape(n_blocks, sync_every)
        live = (jnp.arange(total) < n_steps).reshape(n_blocks, sync_every)
        (x, y), (auc_sums, live_sums) = jax.lax.scan(
            block, (x, y), (keys, live))
        auc = jnp.sum(auc_sums) / jnp.maximum(jnp.sum(live_sums), 1)
        return x, y, jax.lax.pmean(auc, axis)

    def epoch_local(x, y, seen_l, rows_l, cols_l, key_epoch):
        shard = jax.lax.axis_index(axis)
        lo = shard * b_loc

        def step(carry, key_step):
            x, y = carry
            kp, kn = jax.random.split(key_step)
            # full-batch draws on every device (same as single-chip),
            # local gradient math on this device's slice
            idx = jax.random.randint(kp, (batch_size,), 0, nnz)
            j_all = jax.random.randint(kn, (batch_size,), 0, n_items)
            idx_l = jax.lax.dynamic_slice_in_dim(idx, lo, b_loc)
            j_l = jax.lax.dynamic_slice_in_dim(j_all, lo, b_loc)
            u_l, i_l = rows_l[idx_l], cols_l[idx_l]
            ok_l = ~seen_l[u_l, j_l]
            margin_l = jnp.sum(x[u_l] * (y[i_l] - y[j_l]), axis=1)
            g_l = jnp.where(ok_l, jax.nn.sigmoid(-margin_l), 0.0)
            okf_l = ok_l.astype(x.dtype)

            # the only collective: batch-wide gradient scalars
            g = jax.lax.all_gather(g_l, axis, axis=0, tiled=True)
            okf = jax.lax.all_gather(okf_l, axis, axis=0, tiled=True)
            u, i = rows_l[idx], cols_l[idx]
            j = j_all
            gc, okc = g[:, None], okf[:, None]
            xu, yi, yj = x[u], y[i], y[j]
            x = x.at[u].add(lr * (gc * (yi - yj) - reg * okc * xu))
            y = y.at[i].add(lr * (gc * xu - reg * okc * yi))
            y = y.at[j].add(lr * (-gc * xu - reg * okc * yj))
            auc_num_l = jnp.sum(jnp.where(ok_l, margin_l > 0, False))
            auc = jax.lax.psum(auc_num_l, axis) \
                / jnp.maximum(jax.lax.psum(jnp.sum(ok_l), axis), 1)
            return (x, y), auc

        keys = jax.random.split(key_epoch, n_steps)
        (x, y), aucs = jax.lax.scan(step, (x, y), keys)
        return x, y, jnp.mean(aucs)

    epoch = jax.jit(shard_map(
        epoch_local_sgd if update_mode == "local" else epoch_local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()), check_vma=False))

    itemsize = jnp.dtype(dtype).itemsize
    if update_mode == "local":
        # pmean of both tables per sync block
        comm_bytes = int(n_blocks * (n_users + n_items) * rank * itemsize)
    else:
        # per-step all_gathered gradient scalars
        comm_bytes = int(n_steps * 2 * batch_size * itemsize)
    epochs_log = [] if train_stats is not None else None
    pending_aucs = [] if epoch_stats is not None else None
    for _ in range(num_epochs):
        key, key_epoch = jax.random.split(key)
        start = time.perf_counter()
        user_factors, item_factors, auc = epoch(
            user_factors, item_factors, seen, rows_d, cols_d, key_epoch)
        if epochs_log is not None:
            # per-epoch sync ONLY for the wall-time log (dryrun scaling
            # study); plain epoch_stats defers to one stacked transfer
            # below — a per-epoch float() costs a full tunnel RTT each
            auc = float(auc)
            epochs_log.append({"auc": auc,
                               "wall_s": time.perf_counter() - start,
                               "comm_bytes": comm_bytes})
        if pending_aucs is not None:
            pending_aucs.append(auc)
    if pending_aucs:
        synced = np.asarray(jnp.stack(
            [jnp.asarray(a, jnp.float32) for a in pending_aucs]))
        epoch_stats.extend(synced.astype(float).tolist())
    if train_stats is not None:
        train_stats.update(mode=update_mode, n_devices=n_dev,
                           steps_per_epoch=n_steps, epochs=epochs_log)
    return ImplicitFactors(user=user_factors, item=item_factors)


def distributed_hooi(idx: np.ndarray, val: np.ndarray, shape, core_shape,
                     mesh: Mesh, num_iters: int = 25,
                     growth_tol: float = 1e-4, seed: Optional[int] = None,
                     dtype=jnp.float32, verbose: bool = False,
                     qr_method: Optional[str] = None,
                     init_factors: Optional[Tuple] = None):
    """HOOI with the tensor nonzeros sharded over the mesh's first axis.

    The event contractions (the O(nnz·r) work) run shard-local and psum
    their small (n_mode × n_fb × r) outputs; the skinny factor updates
    replicate — they are panel-sized.  Event padding uses zero values, so
    partitioning does not change the math (up to float reduction order).
    """
    from jax import shard_map

    from polara_tpu.ops.hooi import HooiResult, _hooi_sweep

    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    n0, n1, n2 = (int(s) for s in shape)
    r0, r1, r2 = core_shape

    nnz = len(val)
    pad = (-nnz) % n_dev
    def shard(arr, fill):
        arr = np.concatenate([np.asarray(arr),
                              np.full(pad, fill, np.asarray(arr).dtype)])
        return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, P(axis)))

    i0 = shard(idx[:, 0].astype(np.int32), 0)
    i1 = shard(idx[:, 1].astype(np.int32), 0)
    i2 = shard(idx[:, 2].astype(np.int32), 0)
    vals = shard(np.asarray(val, np.float64).astype(dtype), 0)

    if init_factors is not None:
        u1, u2 = (jnp.asarray(np.asarray(f), dtype) for f in init_factors)
        # mirror single-device hooi's validation (ops/hooi.py:126-128) —
        # without it a mismatched warm start dies in an opaque shard_map
        # broadcast error instead of a clear ValueError
        if u1.shape != (n1, r1) or u2.shape != (n2, r2):
            raise ValueError(f"init factors {u1.shape}/{u2.shape} do not "
                             f"match modes {(n1, r1)}/{(n2, r2)}")
    else:
        key = jax.random.key(0 if seed is None else seed)
        k1, k2 = jax.random.split(key)
        u1 = jnp.linalg.qr(jax.random.uniform(k1, (n1, r1), dtype))[0]
        u2 = jnp.linalg.qr(jax.random.uniform(k2, (n2, r2), dtype))[0]
    u0 = jnp.zeros((n0, r0), dtype)

    if qr_method is None:
        from polara_tpu.ops.rsvd import default_qr_method
        qr_method = default_qr_method()
    sweep_local = partial(_hooi_sweep.__wrapped__, shape=(n0, n1, n2),
                          core_shape=tuple(core_shape), axis_name=axis,
                          qr_method=qr_method)
    sweep = jax.jit(shard_map(
        sweep_local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P()), check_vma=False))

    norm_old = 0.0
    history = []
    core = jnp.zeros(core_shape, dtype)
    for step in range(num_iters):
        u0, u1, u2, core, core_norm = sweep(i0, i1, i2, vals, u0, u1, u2)
        norm_new = float(core_norm)
        growth = (norm_new - norm_old) / norm_new
        norm_old = norm_new
        history.append(growth)
        if verbose:
            print(f"distributed HOOI step {step + 1}: growth {growth:.6f}")
        if growth < growth_tol:
            break
    return HooiResult(u0=u0, u1=u1, u2=u2, core=core,
                      growth_history=tuple(history))


def _cholesky_qr2_psum(a: jax.Array, axis: str):
    """CholeskyQR2 over a row-sharded panel inside ``shard_map``: the
    (b × b) Gram is the only cross-device reduction (one psum per pass),
    the triangular solve runs on local rows."""
    def one(a):
        gram = jax.lax.psum(a.T @ a, axis)
        r = jnp.linalg.cholesky(gram).T
        q = jax.scipy.linalg.solve_triangular(r, a.T, lower=False,
                                              trans="T").T
        return q, r

    q1, r1 = one(a)
    q2, r2 = one(q1)
    return q2, r2 @ r1


def _band_passes(lrows, cols, vals, starts, *, span: int, m_band: int,
                 n: int, blk: int):
    """Local (per-band) ``A @ x`` / ``Aᵀ @ y`` scans over a device's
    chunked event panels.  ``rmm`` returns the LOCAL column reduction —
    the caller psums."""

    def mm(x):                       # (n, blk) -> (m_band, blk) local
        def body(acc, chunk):
            lr, cl, vl, st = chunk
            contrib = vl[:, None] * x[cl]
            seg = jax.ops.segment_sum(contrib, lr, num_segments=span,
                                      indices_are_sorted=True)
            zero = jnp.zeros((), st.dtype)
            cur = jax.lax.dynamic_slice(acc, (st, zero), (span, blk))
            return jax.lax.dynamic_update_slice(acc, cur + seg,
                                                (st, zero)), None

        acc = jnp.zeros((m_band, blk), x.dtype)
        acc, _ = jax.lax.scan(body, acc, (lrows, cols, vals, starts))
        return acc

    def rmm_local(y):                # (m_band, blk) local -> (n, blk)
        def body(acc, chunk):
            lr, cl, vl, st = chunk
            ys = jax.lax.dynamic_slice(y, (st, jnp.zeros((), st.dtype)),
                                       (span, blk))
            contrib = vl[:, None] * ys[lr]
            return acc + jax.ops.segment_sum(contrib, cl,
                                             num_segments=n), None

        acc = jnp.zeros((n, blk), y.dtype)
        acc, _ = jax.lax.scan(body, acc, (lrows, cols, vals, starts))
        return acc

    return mm, rmm_local


def _rsvd_power_psum(mm, rmm, omega, *, axis: str, n_iter: int, k: int,
                     tol: Optional[float], max_iter: int):
    """Shared power-iteration scaffold of the distributed rsvd bodies:
    row-panel QR via :func:`_cholesky_qr2_psum` (b × b Gram psum),
    item-panel QR replicated (deterministic, identical on all devices).
    Per-iteration traffic is O(n·b + b²) — independent of both the user
    count and nnz."""
    q, _ = _cholesky_qr2_psum(mm(omega), axis)
    if tol is None:
        for _ in range(n_iter):
            z, _ = cholesky_qr2(rmm(q))  # replicated item-side panel
            q, _ = _cholesky_qr2_psum(mm(z), axis)
    else:
        # iterate until the top-k singular estimates stabilize — the
        # estimates derive from the psum'd Gram, so every device reaches
        # the identical stop decision (mirrors ops.rsvd._power_until)
        def cond(carry):
            _, _, i, done = carry
            return jnp.logical_and(~done, i < max_iter)

        def body(carry):
            q, s_prev, i, _ = carry
            z, rz = cholesky_qr2(rmm(q))
            s_top = jnp.abs(jnp.diagonal(rz))[:k]
            q, _ = _cholesky_qr2_psum(mm(z), axis)
            rel = jnp.max(jnp.abs(s_top - s_prev)
                          / jnp.maximum(jnp.abs(s_top), 1e-30))
            return q, s_top, i + 1, rel < tol

        q, _, _, _ = jax.lax.while_loop(
            cond, body, (q, jnp.full((k,), jnp.inf, q.dtype),
                         jnp.asarray(0), jnp.asarray(False)))
    b_mat = rmm(q).T                     # (blk, n) replicated
    ub, s, vt = jnp.linalg.svd(b_mat, full_matrices=False)
    return (q @ ub)[:, :k], s[:k], vt[:k, :].T


def _chunked_rsvd_local(lrows, cols, vals, starts, omega, *, axis: str,
                        span: int, m_band: int, n_iter: int, k: int,
                        tol: Optional[float] = None, max_iter: int = 100):
    """Per-device body of :func:`distributed_chunked_rsvd`.

    Each device owns a contiguous user-row band as a chunked event
    stream (``(C_local, event_chunk)`` panels, local row ids).  The
    power iteration alternates:

    * ``A @ x``: shard-local scan (gather + sorted segment_sum per
      chunk), output rows stay local — zero communication;
    * ``Aᵀ @ y``: shard-local column reduction, then one (n × b) psum.
    """
    n, blk = omega.shape
    mm, rmm_local = _band_passes(lrows, cols, vals, starts, span=span,
                                 m_band=m_band, n=n, blk=blk)
    rmm = lambda y: jax.lax.psum(rmm_local(y), axis)
    return _rsvd_power_psum(mm, rmm, omega, axis=axis, n_iter=n_iter,
                            k=k, tol=tol, max_iter=max_iter)


def _split_rsvd_local(lrows, cols, vals, starts, d_local, head_ids, omega,
                      *, axis: str, span: int, m_band: int, n_iter: int,
                      k: int, tol: Optional[float] = None,
                      max_iter: int = 100):
    """Per-device body of the split-head mesh tier: each device owns its
    user-row band's slice of the dense Zipf head block (``d_local``,
    ``(nb_local, block_rows, P)`` — int8 when lossless, upcast
    block-by-block inside the scan exactly like the single-chip
    operator) plus its band's TAIL events in the chunked layout.

    * ``A @ x``: local head matmul + local tail scan — zero
      communication;
    * ``Aᵀ @ y``: local ``D_bandᵀ @ y_band`` (a (P, b) panel) scattered
      into the local tail column reduction, then the same one (n × b)
      psum as the plain path — the head adds NO extra collectives.
    """
    from polara_tpu.ops.sparse import _head_mm_blocks, _head_rmm_blocks

    n, blk = omega.shape
    tail_mm, tail_rmm_local = _band_passes(lrows, cols, vals, starts,
                                           span=span, m_band=m_band,
                                           n=n, blk=blk)

    def mm(x):
        return tail_mm(x) + _head_mm_blocks(d_local, head_ids, x, m_band)

    def rmm(y):
        head = _head_rmm_blocks(d_local, y)          # (P, blk) local
        # tail events never reference head columns -> disjoint adds
        acc = tail_rmm_local(y).at[head_ids].add(head)
        return jax.lax.psum(acc, axis)

    return _rsvd_power_psum(mm, rmm, omega, axis=axis, n_iter=n_iter,
                            k=k, tol=tol, max_iter=max_iter)


def distributed_chunked_rsvd(rows: np.ndarray, cols: np.ndarray,
                             vals: np.ndarray, shape, k: int, mesh: Mesh,
                             oversample: Optional[int] = None,
                             n_iter: int = 6, seed: int = 0,
                             event_chunk: int = 1_000_000,
                             tol: Optional[float] = None,
                             max_iter: int = 100,
                             dtype=jnp.float32,
                             split_head: bool = False,
                             head_items="auto",
                             head_budget_gb: float = 4.0,
                             head_block_rows: int = 4096,
                             min_coverage: float = 0.15) -> SvdResult:
    """Randomized SVD of a beyond-HBM sparse matrix, events sharded over
    the mesh.

    The multi-chip tier of :func:`polara_tpu.ops.sparse.
    chunked_coo_operator`: the user-row range splits into ``n_dev``
    contiguous bands (one per device along the mesh's first axis); each
    device stages its band's events as static chunk panels and the whole
    subspace iteration runs inside ONE ``shard_map`` program — HBM per
    device is ~nnz/n_dev events plus one (event_chunk, block)
    contribution block, so the trainable problem grows linearly with the
    mesh.  Math is identical to the single-device path with
    ``qr_method="cholesky2"`` up to float reduction order
    (mesh == single-device parity tested in ``tests/test_parallel.py``).

    ``rows`` must be row-sorted (the data model's ``to_coo`` order);
    numpy inputs are staged host-side — pass numpy, not device arrays,
    to avoid a device→host round trip of the event stream.  ``tol``
    enables the single-device stabilization stopping rule (estimates
    derive from the psum'd Gram, so all devices stop together); block
    auto-escalation is not available on the mesh path — the block is
    fixed at ``k + oversample``.
    """
    from jax import shard_map

    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    nnz = len(rows)
    if nnz == 0:
        raise ValueError("empty matrix")
    if not bool(np.all(np.diff(rows) >= 0)):
        order = np.argsort(rows, kind="stable")
        rows, cols, vals = rows[order], cols[order], vals[order]
    m, n = (int(s) for s in shape)
    if k <= 0 or k > min(m, n):
        raise ValueError(f"rank {k} out of range for shape {(m, n)}")
    blk = min(k + (oversample if oversample is not None else max(10, k)),
              min(m, n))

    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    m_band = -(-m // n_dev)

    head = None
    if split_head:
        head = _stage_split_head(rows, cols, vals, m, n, n_dev, m_band,
                                 mesh, axis, head_items, head_budget_gb,
                                 head_block_rows, min_coverage, dtype)
    if head is not None:
        d_sharded, head_ids_d, tail_mask = head
        rows, cols, vals = rows[tail_mask], cols[tail_mask], vals[tail_mask]

    bounds = np.searchsorted(rows, np.arange(n_dev + 1) * m_band)
    max_e = max(int((bounds[1:] - bounds[:-1]).max()), 1)
    event_chunk = min(event_chunk, max_e)
    c_local = -(-max_e // event_chunk)
    e_pad = c_local * event_chunk

    lrows_st = np.zeros((n_dev, c_local, event_chunk), np.int32)
    cols_st = np.zeros((n_dev, c_local, event_chunk), np.int32)
    vals_st = np.zeros((n_dev, c_local, event_chunk), np.float64)
    for d in range(n_dev):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        lr = rows[lo:hi].astype(np.int64) - d * m_band
        fill = int(lr[-1]) if hi > lo else 0
        lr = np.concatenate([lr, np.full(e_pad - (hi - lo), fill,
                                         np.int64)])
        lrows_st[d] = lr.reshape(c_local, event_chunk)
        cols_st[d, :, :].reshape(-1)[:hi - lo] = cols[lo:hi]
        vals_st[d, :, :].reshape(-1)[:hi - lo] = vals[lo:hi]
    span = int((lrows_st[:, :, -1] - lrows_st[:, :, 0]).max()) + 1
    span = min(max(span, 1), m_band)
    starts = np.minimum(lrows_st[:, :, 0], m_band - span).astype(np.int32)
    lrows_st = lrows_st - starts[:, :, None]

    def put(arr, dt):
        flat = jnp.asarray(arr.reshape((n_dev * c_local,)
                                       + arr.shape[2:]), dt)
        return jax.device_put(flat, NamedSharding(mesh, P(axis)))

    lrows_d = put(lrows_st, jnp.int32)
    cols_d = put(cols_st, jnp.int32)
    vals_d = put(vals_st, dtype)
    starts_d = put(starts, jnp.int32)
    omega = jax.device_put(
        jax.random.normal(jax.random.key(seed), (n, blk), dtype=dtype),
        NamedSharding(mesh, P()))

    common = dict(axis=axis, span=span, m_band=m_band, n_iter=n_iter,
                  k=k, tol=None if tol is None else float(tol),
                  max_iter=max_iter)
    if head is not None:
        fn = jax.jit(shard_map(
            partial(_split_rsvd_local, **common), mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(),
                      P()),
            out_specs=(P(axis), P(), P()), check_vma=False))
        u, s, v = fn(lrows_d, cols_d, vals_d, starts_d, d_sharded,
                     head_ids_d, omega)
    else:
        fn = jax.jit(shard_map(
            partial(_chunked_rsvd_local, **common), mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
            out_specs=(P(axis), P(), P()), check_vma=False))
        u, s, v = fn(lrows_d, cols_d, vals_d, starts_d, omega)
    return SvdResult(u=u[:m], s=s, v=v)


def _stage_split_head(rows, cols, vals, m, n, n_dev, m_band, mesh, axis,
                      head_items, head_budget_gb, head_block_rows,
                      min_coverage, dtype):
    """Head selection + row-sharded head-block build for the split-head
    mesh tier of :func:`distributed_chunked_rsvd`.

    The same head rules as the single-chip operator
    (``ops.sparse.split_coo_operator``): auto-size P from the budget,
    lane-align, decline when the covered event fraction cannot pay.  The
    block builds through :func:`ops.sparse.build_head_block` over
    device-band-padded row ids, so reshaping to ``(n_dev · nb_local,
    block_rows, P)`` and sharding dim 0 over the mesh gives every device
    exactly its user band's rows — the row-band layout IS the head
    layout.  Returns ``(d_sharded, head_ids_dev, tail_mask)`` or
    ``None`` when the head declines.
    """
    from polara_tpu.ops.sparse import build_head_block

    nnz = len(rows)
    int8_ok = bool(vals.size
                   and np.abs(vals).max() <= 127
                   and np.array_equal(vals, np.rint(vals)))
    itemsize = 1 if int8_ok else np.dtype(dtype).itemsize
    if head_items == "auto":
        p = int(head_budget_gb * 2 ** 30) // (m * itemsize)
    else:
        p = int(head_items)
    p = min(p, n)
    if p >= 128:
        p = (p // 128) * 128
    if p < 1:
        return None

    if p < n:
        counts = np.bincount(cols, minlength=n)
        top = np.argpartition(counts, n - p)[n - p:]
        if counts[top].sum() / nnz < min_coverage:
            return None
        head_ids = np.sort(top).astype(np.int32)
        is_head = np.zeros(n, bool)
        is_head[head_ids] = True
        mask = is_head[cols]
        hr, hc, hv = rows[mask], cols[mask], vals[mask]
    else:
        head_ids = np.arange(n, dtype=np.int32)
        mask = np.ones(nnz, bool)
        hr, hc, hv = rows, cols, vals

    head_pos = np.zeros(n, np.int32)
    head_pos[head_ids] = np.arange(p, dtype=np.int32)
    br = min(head_block_rows, m_band)
    nb_local = -(-m_band // br)
    m_band_pad = nb_local * br
    dev = hr // m_band
    hr_pad = (dev * m_band_pad + (hr - dev * m_band)).astype(np.int64)

    d_flat = build_head_block(
        jnp.asarray(hr_pad, jnp.int32), jnp.asarray(head_pos[hc]),
        jnp.asarray(hv, dtype), n_dev * m_band_pad, p, dtype,
        head_budget_gb=head_budget_gb, int8_ok=int8_ok)
    d_sharded = jax.device_put(
        d_flat.reshape(n_dev * nb_local, br, p),
        NamedSharding(mesh, P(axis)))
    head_ids_d = jax.device_put(jnp.asarray(head_ids),
                                NamedSharding(mesh, P()))
    return d_sharded, head_ids_d, ~mask


def sharded_score_topk_2d(item_factors: jax.Array, profiles: jax.Array,
                          topk: int, mesh: Mesh) -> jax.Array:
    """Tensor-parallel scoring over a 2-D (users × model) mesh.

    Users shard over the first mesh axis (data parallel); the item
    catalog shards over the second (model/tensor parallel).  Each device
    scores its (user-shard × item-shard) block, takes a LOCAL top-k,
    offsets local columns to global item ids, all-gathers the k-candidate
    panels across the model axis, and reduces to the final top-k — the
    classic two-stage distributed top-k, with only (k · n_model) floats
    crossing ICI per user row.

    Seen-item filtering uses the local profile block (seen scores to
    -inf), matching ``mask_and_topk`` semantics for k ≤ unseen items.
    """
    users_axis, model_axis = mesh.axis_names[0], mesh.axis_names[1]
    n_items = item_factors.shape[0]
    n_model = mesh.shape[model_axis]
    if n_items % n_model:
        raise ValueError(f"the model axis size {n_model} must divide "
                         f"the item axis {n_items}")
    step = _sharded_topk_2d_step(mesh, topk)
    return step(item_factors, profiles)


_topk_2d_cache: dict = {}


def _sharded_topk_2d_step(mesh: Mesh, topk: int):
    """Compiled 2-D scoring step, cached per (mesh, topk) so repeated
    calls reuse one executable."""
    key = (mesh, topk)
    cached = _topk_2d_cache.get(key)
    if cached is not None:
        return cached

    from jax import shard_map

    users_axis, model_axis = mesh.axis_names[0], mesh.axis_names[1]

    def local_step(v_local, profiles_local):
        # profiles_local: (u_loc, n_items) sharded cols; v_local: (i_loc, r)
        shard = jax.lax.axis_index(model_axis)
        i_loc = v_local.shape[0]
        col_base = shard * i_loc
        # profile columns matching this shard's item slice
        local_profile = jax.lax.dynamic_slice_in_dim(
            profiles_local, col_base, i_loc, axis=1)
        proj = local_profile @ v_local         # (u_loc, r) partial
        proj = jax.lax.psum(proj, model_axis)  # full projection
        scores = proj @ v_local.T              # (u_loc, i_loc)
        scores = jnp.where(local_profile > 0, -jnp.inf, scores)
        vals, idx = jax.lax.top_k(scores, min(topk, i_loc))
        idx = idx + col_base
        # gather candidate panels from every model shard
        vals = jax.lax.all_gather(vals, model_axis, axis=1, tiled=True)
        idx = jax.lax.all_gather(idx, model_axis, axis=1, tiled=True)
        final_vals, pos = jax.lax.top_k(vals, topk)
        return jnp.take_along_axis(idx, pos, axis=1).astype(jnp.int32)

    step = jax.jit(shard_map(
        local_step, mesh=mesh,
        in_specs=(P(model_axis, None), P(users_axis, None)),
        out_specs=P(users_axis, None), check_vma=False))
    _topk_2d_cache[key] = step
    return step
