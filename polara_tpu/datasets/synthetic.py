"""Synthetic interaction generator.

Not present in the reference — added because this framework targets
egress-free TPU environments: benchmarks and integration tests need
realistically shaped interaction logs without downloading archives.
Generates a low-rank-plus-noise preference structure with a power-law
item popularity profile, so factor models have signal to find.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import pandas as pd


def make_synthetic_interactions(n_users: int = 1000, n_items: int = 500,
                                n_events: int = 20_000, rank: int = 8,
                                popularity_skew: float = 1.0,
                                rating_levels: int = 5,
                                include_time: bool = False,
                                seed: Optional[int] = 0) -> pd.DataFrame:
    """Sample a deduplicated interaction log ``userid/movieid/rating``.

    Items are drawn from a Zipf-like profile (exponent
    ``popularity_skew``); ratings discretize a rank-``rank`` latent score
    plus noise onto ``1..rating_levels``.
    """
    rs = np.random.RandomState(seed)
    weights = 1.0 / np.arange(1, n_items + 1) ** popularity_skew
    weights /= weights.sum()

    users = rs.randint(0, n_users, n_events * 2)
    items = rs.choice(n_items, n_events * 2, p=weights)
    pairs = np.unique(np.stack([users, items], axis=1), axis=0)
    if len(pairs) > n_events:
        keep = rs.choice(len(pairs), n_events, replace=False)
        pairs = pairs[np.sort(keep)]
    users, items = pairs[:, 0], pairs[:, 1]

    u_fac = rs.randn(n_users, rank) / np.sqrt(rank)
    i_fac = rs.randn(n_items, rank) / np.sqrt(rank)
    latent = (u_fac[users] * i_fac[items]).sum(axis=1)
    latent = latent + 0.25 * rs.randn(len(latent))
    qs = np.quantile(latent, np.linspace(0, 1, rating_levels + 1)[1:-1])
    ratings = np.digitize(latent, qs) + 1

    frame = {"userid": users, "movieid": items, "rating": ratings}
    if include_time:
        frame["timestamp"] = rs.randint(0, 10_000_000, len(users))
    return pd.DataFrame(frame)


# ML-1M rating histogram (share of 1..5 stars over the full dataset);
# used to discretize the latent scores so synthetic rating marginals
# match the real data the reference's published numbers come from.
ML1M_RATING_HIST = (0.056, 0.108, 0.261, 0.349, 0.226)


def make_realistic_coo(n_users: int, n_items: int, n_events: int,
                       rank: int = 16, popularity_skew: float = 0.85,
                       activity_skew: float = 0.6,
                       spectrum_decay: float = 0.6, noise: float = 0.4,
                       affinity: float = 2.0, popularity_bias: float = 0.15,
                       rating_hist=ML1M_RATING_HIST,
                       min_events_per_user: int = 5,
                       seed: Optional[int] = 0):
    """Calibrated interaction log as sorted COO arrays.

    Unlike :func:`make_synthetic_interactions` (uniform margins, fast
    geometric latent decay) this generator is calibrated to MovieLens-like
    structure, which matters for three things a uniform workload cannot
    exercise (round-1 verdict):

    * **popularity skew** — items follow a Zipf(``popularity_skew``)
      profile and users a Zipf(``activity_skew``) activity profile, so
      top-k runs into heavy tie mass on popular items and the rating
      matrix has the dominant popularity component of real data;
    * **slowly decaying spectrum** — latent factor k carries weight
      ``k**-spectrum_decay`` (plus rating discretization noise), so the
      matrix spectrum decays like a real rating matrix instead of the
      ``0.7**k`` geometric cliff, which is the regime where randomized
      SVD needs its power iterations;
    * **preference-correlated exposure** — each user's item set is drawn
      without replacement from ``softmax(log pop + affinity * u.v)``
      (exact Gumbel-top-k sampling), so *which* items a user rated
      carries latent signal, as in real logs.  This is what makes
      personalized models beat raw popularity, reproducing the
      reference's published quality ordering (README.md:117-123).

    Ratings discretize latent scores onto 1..5 with global quantile
    edges matched to the ML-1M histogram; popular items get a mild
    positive rating bias (``popularity_bias``).  Pairs are unique by
    construction.  Returns ``(rows, cols, vals)`` sorted by row; the
    event count is ``n_events`` up to per-user clipping (within ~1%).
    """
    max_per_user = int(0.5 * n_items)
    if n_events > n_users * max_per_user:
        raise ValueError("n_events too dense for without-replacement "
                         "sampling")
    rs = np.random.RandomState(seed)
    item_w = 1.0 / np.arange(1, n_items + 1) ** popularity_skew
    item_w /= item_w.sum()
    user_w = 1.0 / np.arange(1, n_users + 1) ** activity_skew
    user_w /= user_w.sum()

    # per-user event counts: largest-remainder split of n_events over the
    # activity profile, clipped to [min_events_per_user, n_items/2]
    n_per_user = _largest_remainder_counts(
        n_events, user_w, min_events_per_user, max_per_user, rs)

    # low-rank latent with sigma_k ~ k^-decay
    col_weights = np.arange(1, rank + 1, dtype=np.float64) ** -spectrum_decay
    u_fac = rs.randn(n_users, rank) * col_weights
    i_fac = rs.randn(n_items, rank)

    log_pop = np.log(item_w)
    rows_parts, cols_parts, score_parts = [], [], []
    chunk = max(1, min(n_users, int(4e7) // max(n_items, 1)))
    for start in range(0, n_users, chunk):
        stop = min(start + chunk, n_users)
        aff = u_fac[start:stop] @ i_fac.T
        aff /= max(aff.std(), 1e-12)
        logits = log_pop[None, :] + affinity * aff
        # Gumbel-top-k == sampling without replacement from softmax(logits)
        gumbel = -np.log(-np.log(
            rs.random_sample((stop - start, n_items)) + 1e-300) + 1e-300)
        keyed = logits + gumbel
        kmax = int(n_per_user[start:stop].max())
        top = np.argpartition(-keyed, kmax - 1, axis=1)[:, :kmax]
        # order the candidate block by key so row r takes its first n_r
        order = np.argsort(-np.take_along_axis(keyed, top, axis=1), axis=1)
        top = np.take_along_axis(top, order, axis=1)
        for r in range(stop - start):
            k = int(n_per_user[start + r])
            items_r = top[r, :k]
            rows_parts.append(np.full(k, start + r, dtype=np.int32))
            cols_parts.append(items_r.astype(np.int32))
            score_parts.append(aff[r, items_r])
    rows = np.concatenate(rows_parts)
    cols = np.concatenate(cols_parts)
    score = np.concatenate(score_parts)

    # ratings: latent affinity + noise + mild popularity->rating bias
    score = score + noise * rs.randn(len(score))
    pop_z = np.log1p(cols.astype(np.float64))
    pop_z = (pop_z - pop_z.mean()) / max(pop_z.std(), 1e-12)
    score -= popularity_bias * pop_z  # low col index == popular == higher
    edges = np.quantile(score, np.cumsum(rating_hist)[:-1])
    vals = (np.digitize(score, edges) + 1).astype(np.float64)
    return rows, cols, vals


def _largest_remainder_counts(n_events: int, weights: np.ndarray,
                              lo: int, hi: int,
                              rs: np.random.RandomState) -> np.ndarray:
    """Integer per-user event counts from a weight profile, clipped to
    [lo, hi] and permuted so activity decouples from user id."""
    quota = n_events * weights
    counts = np.floor(quota).astype(np.int64)
    short = int(n_events - counts.sum())
    if short > 0:
        order = np.argsort(quota - counts)[::-1]
        counts[order[:short]] += 1
    counts = np.clip(counts, lo, hi)
    return rs.permutation(counts)


def make_realistic_coo_device(n_users: int, n_items: int, n_events: int,
                              rank: int = 16, popularity_skew: float = 0.85,
                              activity_skew: float = 0.6,
                              spectrum_decay: float = 0.6,
                              noise: float = 0.4, affinity: float = 2.0,
                              popularity_bias: float = 0.15,
                              rating_hist=ML1M_RATING_HIST,
                              min_events_per_user: int = 5,
                              seed: int = 0, row_chunk: int = 8192,
                              as_device: bool = False, log=None):
    """Device-side counterpart of :func:`make_realistic_coo`.

    Same calibration (Zipf margins, slow-decay latent spectrum,
    preference-correlated exposure via exact Gumbel-top-k sampling
    without replacement), but the (users × items) keying/sorting work —
    the part that is hopeless on a slow host — runs as JAX programs on
    the accelerator, chunked over user rows.  Different RNG streams than
    the numpy version (jax.random vs RandomState), so draws are not
    comparable; the *distribution* is.

    Returns numpy ``(rows, cols, vals)`` sorted by row.
    """
    import jax
    import jax.numpy as jnp

    max_per_user = int(0.5 * n_items)
    if n_events > n_users * max_per_user:
        raise ValueError("n_events too dense for without-replacement "
                         "sampling")
    rs = np.random.RandomState(seed)
    item_w = 1.0 / np.arange(1, n_items + 1) ** popularity_skew
    item_w /= item_w.sum()
    user_w = 1.0 / np.arange(1, n_users + 1) ** activity_skew
    user_w /= user_w.sum()
    n_per_user = _largest_remainder_counts(
        n_events, user_w, min_events_per_user, max_per_user, rs)

    col_weights = np.arange(1, rank + 1, dtype=np.float64) ** -spectrum_decay
    key = jax.random.key(seed)
    k_u, k_i, k_noise, k_gumbel = jax.random.split(key, 4)
    u_fac = (jax.random.normal(k_u, (n_users, rank), jnp.float32)
             * jnp.asarray(col_weights, jnp.float32))
    i_fac = jax.random.normal(k_i, (n_items, rank), jnp.float32)
    log_pop = jnp.asarray(np.log(item_w), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("take",))
    def chunk_events(u_chunk, counts, gumbel_key, take: int):
        """Top-``counts[r]`` Gumbel-perturbed items per chunk row,
        compacted to flat (row, col, affinity-score) arrays of static
        length ``take`` (= the chunk's exact event total)."""
        aff = u_chunk @ i_fac.T
        aff = aff / jnp.maximum(aff.std(), 1e-12)
        keyed = log_pop[None, :] + affinity * aff
        keyed = keyed + jax.random.gumbel(gumbel_key, keyed.shape,
                                          keyed.dtype)
        order = jnp.argsort(-keyed, axis=1)
        pos = jax.lax.broadcasted_iota(jnp.int32, order.shape, 1)
        mask = pos < counts[:, None]
        flat = jnp.nonzero(mask.ravel(), size=take)[0]
        rows_local = (flat // n_items).astype(jnp.int32)
        cols_sel = order.ravel()[flat].astype(jnp.int32)
        return rows_local, cols_sel, aff[rows_local, cols_sel]

    starts = list(range(0, n_users, row_chunk))
    takes = [int(n_per_user[s:min(s + row_chunk, n_users)].sum())
             for s in starts]
    width = max(takes)  # one compiled event width for every chunk
    rows_parts, cols_parts, score_parts = [], [], []
    keys = jax.random.split(k_gumbel, len(starts))
    report_every = max(1, len(starts) // 8)
    for c, start in enumerate(starts):
        if log is not None and c % report_every == 0:
            log(f"  generating user chunk {c + 1}/{len(starts)}")
        stop = min(start + row_chunk, n_users)
        take = takes[c]
        # pad the user block so every chunk reuses one executable
        u_chunk = u_fac[start:stop]
        counts_dev = jnp.asarray(n_per_user[start:stop], jnp.int32)
        if stop - start < row_chunk:
            pad = row_chunk - (stop - start)
            u_chunk = jnp.pad(u_chunk, ((0, pad), (0, 0)))
            counts_dev = jnp.pad(counts_dev, (0, pad))
        r_loc, c_sel, s_sel = chunk_events(u_chunk, counts_dev, keys[c],
                                           width)
        rows_parts.append(r_loc[:take] + jnp.int32(start))
        cols_parts.append(c_sel[:take])
        score_parts.append(s_sel[:take])
    rows_dev = jnp.concatenate(rows_parts)
    cols_dev = jnp.concatenate(cols_parts)
    score = jnp.concatenate(score_parts).astype(jnp.float32)

    # ratings: latent + noise + mild popularity->rating bias, discretized
    # on global quantile edges matched to the target rating histogram
    score = score + noise * jax.random.normal(k_noise, score.shape,
                                              score.dtype)
    pop_z = jnp.log1p(cols_dev.astype(jnp.float32))
    pop_z = (pop_z - pop_z.mean()) / jnp.maximum(pop_z.std(), 1e-12)
    score = score - popularity_bias * pop_z
    edges = jnp.quantile(score, jnp.asarray(np.cumsum(rating_hist)[:-1],
                                            score.dtype))
    vals_dev = (jnp.searchsorted(edges, score, side="right") + 1)

    if as_device:
        # zero-wire mode: the stream stays on the accelerator (row-sorted
        # int32/int32/float32) — at 100M events the device→host pull is
        # the dominant cost of generation, and benchmark staging can
        # consume device arrays directly (`_upload_event_stream` passes
        # them through untouched)
        return rows_dev, cols_dev, vals_dev.astype(jnp.float32)
    rows = np.asarray(rows_dev)
    cols = np.asarray(cols_dev)
    vals = np.asarray(vals_dev, np.float64)
    return rows, cols, vals


# Benchmark-standard geometries (MovieLens datasets the reference's
# published numbers use).
ML10M_GEOMETRY = dict(n_users=69_878, n_items=10_677, n_events=10_000_054)
ML1M_GEOMETRY = dict(n_users=6_040, n_items=3_706, n_events=1_000_209)
# Netflix-prize geometry: the classic beyond-MovieLens recsys scale.
# Dense f32 at this shape is ~32 GiB — past a single chip's HBM — so it
# exercises the streaming chunked-COO path rather than the dense block.
NETFLIX_GEOMETRY = dict(n_users=480_189, n_items=17_770,
                        n_events=100_480_507)


def _probe_upload_rate(n_bytes: int = 2_000_000) -> float:
    """Host→device wire rate in MB/s from one small timed upload."""
    import time

    import jax
    import jax.numpy as jnp

    buf = np.zeros(n_bytes, np.uint8)
    t0 = time.perf_counter()
    dev = jnp.asarray(buf)
    np.asarray(dev.ravel()[:1])          # device-complete sync
    dt = max(time.perf_counter() - t0, 1e-9)
    del dev
    return n_bytes / 2 ** 20 / dt


def load_or_make_benchmark_coo(geometry: dict, cache_path: str,
                               seed: int = 0, log=None,
                               device: bool = False):
    """Calibrated benchmark interactions at a standard geometry, cached
    on disk (the device generation is a one-time cost per machine).

    ``device=True`` REGENERATES the stream on the accelerator and
    returns device arrays instead of loading the npz — zero host→device
    wire.  Measured at Netflix scale (r5): the benchmark tunnel's bulk
    upload collapses to <1 MB/s in bad epochs (512 s for the 392 MB
    compressed stream), while seeded on-device regeneration is
    wire-independent.  jax.random is deterministic per (seed, backend),
    so repeat runs see the identical workload; callers that also need
    host arrays (e.g. an ARPACK reference) load the npz separately and
    can spot-check a slice for cross-run identity.
    """
    import os

    def say(msg):
        if log is not None:
            log(msg)

    if device:
        # two wire-aware routes to a device-resident stream: the cached
        # npz through the compressed codec upload (fast at nominal wire,
        # ~13 s for 392 MB at Netflix scale), or seeded on-device
        # regeneration (zero wire, ~325 s at Netflix scale) — measured
        # r5: the tunnel's upload direction swings 30 MB/s <-> <0.1 MB/s
        # between epochs, so the route is picked by a 2 MB probe.
        if os.path.exists(cache_path):
            rate = _probe_upload_rate()
            say(f"upload probe: {rate:.1f} MB/s")
            if rate >= 5.0:
                import jax.numpy as jnp
                from polara_tpu.ops.sparse import _upload_event_stream
                say(f"workload cache hit (device upload): {cache_path}")
                with np.load(cache_path) as blob:
                    rows, cols, vals = (blob["rows"], blob["cols"],
                                        blob["vals"])
                shape = (geometry["n_users"], geometry["n_items"])
                rows_d, cols_d, vals_d, _ = _upload_event_stream(
                    rows, cols, vals, shape, jnp.float32, True)
                return rows_d, cols_d, vals_d
        say(f"regenerating calibrated workload on device (zero wire): "
            f"{geometry}")
        return make_realistic_coo_device(seed=seed, log=log,
                                         as_device=True, **geometry)

    if os.path.exists(cache_path):
        say(f"workload cache hit: {cache_path}")
        with np.load(cache_path) as blob:
            return blob["rows"], blob["cols"], blob["vals"]
    say(f"generating calibrated workload on device (one-time): {geometry}")
    rows, cols, vals = make_realistic_coo_device(seed=seed, log=log,
                                                 **geometry)
    say("assembling/caching the event stream on the host")
    try:
        np.savez(cache_path, rows=rows, cols=cols,
                 vals=vals.astype(np.float32))
    except OSError as err:  # pragma: no cover - disk-full etc.
        say(f"workload cache write failed: {err!r}")
    return rows, cols, np.asarray(vals, np.float32)


def load_or_make_ml10m(cache_path: str = "/tmp/polara_tpu_bench_ml10m_v1.npz",
                       seed: int = 0, log=None, device: bool = False):
    return load_or_make_benchmark_coo(ML10M_GEOMETRY, cache_path, seed,
                                      log, device=device)


def load_or_make_ml1m(cache_path: str = "/tmp/polara_tpu_bench_ml1m_v1.npz",
                      seed: int = 0, log=None, device: bool = False):
    return load_or_make_benchmark_coo(ML1M_GEOMETRY, cache_path, seed,
                                      log, device=device)


def load_or_make_netflix(
        cache_path: str = "/tmp/polara_tpu_bench_netflix_v1.npz",
        seed: int = 0, log=None, device: bool = False):
    """Calibrated Netflix-prize-geometry interactions (~100M events).

    Generation is chunked at 4096 user rows so the per-chunk
    (rows × 17,770) Gumbel keying stays within a few hundred MB; the
    one-time cost is dominated by pulling the ~1.2 GB event stream to
    the host for the npz cache.  ``device=True`` keeps the stream on
    the accelerator (regenerated, zero wire).
    """
    geometry = dict(NETFLIX_GEOMETRY, row_chunk=4096)
    return load_or_make_benchmark_coo(geometry, cache_path, seed, log,
                                      device=device)


def make_realistic_interactions(n_users: int = 2000, n_items: int = 1200,
                                n_events: int = 100_000,
                                seed: Optional[int] = 0,
                                **kwargs) -> pd.DataFrame:
    """DataFrame wrapper over :func:`make_realistic_coo` with non-contiguous
    external ids (so reindexing paths are exercised) and a deterministic
    shuffle of event order (so fold splits see interleaved users, as a
    timeline log would)."""
    rows, cols, vals = make_realistic_coo(n_users, n_items, n_events,
                                          seed=seed, **kwargs)
    frame = pd.DataFrame({"userid": rows.astype(np.int64) * 7 + 10_001,
                          "movieid": cols.astype(np.int64) * 3 + 501,
                          "rating": vals.astype(np.int64)})
    rs = np.random.RandomState(None if seed is None else seed + 1)
    return (frame.sample(frac=1, random_state=rs)
            .reset_index(drop=True))
