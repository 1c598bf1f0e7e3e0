"""Polarity-aware evaluation metrics.

Device-native reformulation of the reference metric engine
(``polara/recommender/evaluation.py:23-253``).  The reference assembles six
scipy CSR matrices (rank matrix, positive/negative hit ranks, eval splits)
and reduces them with sparse tricks.  Here the same quantities come from one
dense comparison tensor: with per-user padded holdout lists
``(n_users, h)`` and recommendations ``(n_users, k)``, the membership test
``recs[:, None, :] == holdout[:, :, None]`` yields every hit rank in a
single vectorized pass (h and k are small, so the (n_users, h, k) block is
tiny), and all metric families reduce from it on the VPU without any sparse
bookkeeping.

Numeric parity notes:

* ideal-ranking tie order does not affect nDCG/nDCL sums (equal relevance
  entries commute), so sorting differences vs numpy are immaterial;
* ``safe_divide`` semantics: masked-out entries contribute 0 (the reference
  relies on ``np.divide(where=...)`` leaving zeros);
* coverage counts only valid recommendations — the reference's
  ``np.unique`` would count the -1 padding value as an extra item
  (``evaluation.py:250-253``); we exclude it.
"""
from __future__ import annotations

from collections import namedtuple
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

Relevance = namedtuple("Relevance", ["precision", "recall", "fallout",
                                     "specifity", "miss_rate"])
SimpleRelevance = namedtuple("Relevance", ["hr"])
Ranking = namedtuple("Ranking", ["ndcg", "ndcl", "map", "arhr"])
SimpleRanking = namedtuple("Ranking", ["arhr", "mrr"])
Hits = namedtuple("Hits", ["true_positive", "false_positive",
                           "true_negative", "false_negative"])
Experience = namedtuple("Experience", ["coverage"])


def build_holdout_arrays(holdout: pd.DataFrame, key: str, target: str,
                         feedback: Optional[str] = None,
                         return_positions: bool = False):
    """Pack a key-sorted holdout frame into padded per-key arrays.

    Returns (items, feedback_values, valid_mask), each (n_keys, h_max) —
    plus the per-event (keys, positions) placement when
    ``return_positions`` is set, so callers scattering aligned payloads
    (e.g. polarity flags) reuse the exact same layout.
    Keys are rebased to 0..n_keys-1 by order of appearance — rows align
    with the recommendation matrix exactly as in the reference
    (``evaluation.py:45-61`` relies on the same sorted-key alignment).
    """
    keys = pd.factorize(holdout[key], sort=False)[0]
    n_keys = int(keys.max()) + 1 if len(keys) else 0
    counts = np.bincount(keys, minlength=n_keys)
    width = max(1, int(counts.max()) if counts.size else 1)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    positions = np.arange(len(keys)) - np.repeat(offsets, counts)

    items = np.full((n_keys, width), -1, dtype=np.int64)
    fb = np.zeros((n_keys, width), dtype=np.float64)
    valid = np.zeros((n_keys, width), dtype=bool)
    items[keys, positions] = holdout[target].values
    if feedback is not None:
        fb[keys, positions] = holdout[feedback].values.astype(np.float64)
    else:
        fb[keys, positions] = 1.0
    valid[keys, positions] = True
    if return_positions:
        return items, fb, valid, keys, positions
    return items, fb, valid


@partial(jax.jit, static_argnames=("topk", "alternative", "has_split",
                                   "penalty", "coverage_total"))
def _metrics_core(recs: jax.Array, items: jax.Array, fb: jax.Array,
                  valid: jax.Array, is_pos: jax.Array,
                  topk: int, switch_positive: float,
                  alternative: bool, has_split: bool,
                  penalty: float,
                  coverage_total: int = 0) -> Dict[str, jax.Array]:
    f = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    n_users = recs.shape[0]

    # hit ranks: 1-based position of each holdout item in the user's recs
    match = (recs[:, None, :] == items[:, :, None]) \
        & (recs >= 0)[:, None, :] & valid[:, :, None]
    found = match.any(-1)
    rank = jnp.where(found, jnp.argmax(match, -1) + 1, 0)   # (n_users, h)

    pos_entry = valid & is_pos
    neg_entry = valid & ~is_pos if has_split else jnp.zeros_like(valid)
    pos_rank = jnp.where(pos_entry, rank, 0)
    neg_rank = jnp.where(neg_entry, rank, 0)
    pos_hit = pos_rank > 0
    neg_hit = neg_rank > 0

    # --- counting stats (reference get_relevance_data, evaluation.py:190) --
    n_recs = jnp.sum((recs >= 0), axis=1).astype(f)        # rank-matrix nnz
    tp = jnp.sum(pos_hit, axis=1).astype(f)
    n_eval = jnp.sum(valid, axis=1).astype(f)
    if has_split:
        fp = jnp.sum(neg_hit, axis=1).astype(f)
        tn = jnp.sum(neg_entry, axis=1).astype(f) - fp
        fn = jnp.sum(pos_entry, axis=1).astype(f) - tp
        if penalty > 0:
            fp = fp + penalty * (n_recs - tp - fp)
    else:
        fp = (penalty * (n_recs - tp)) if penalty > 0 \
            else jnp.zeros_like(tp)
        tn = jnp.zeros_like(tp)
        fn = n_eval - tp

    def ratio_mean(num, den, mask):
        return jnp.mean(jnp.where(mask, num / jnp.where(mask, den, 1.0),
                                  0.0))

    tpnz, fnnz = tp > 0, fn > 0
    precision = ratio_mean(tp, tp + fp, tpnz)
    recall = ratio_mean(tp, tp + fn, tpnz)
    miss_rate = ratio_mean(fn, fn + tp, fnnz)
    fallout = ratio_mean(fp, fp + tn, fp > 0)
    specifity = ratio_mean(tn, fp + tn, tn > 0)

    # --- simple rates (evaluation.py:101-118) ------------------------------
    hr = jnp.mean(tp)
    recip = jnp.where(pos_hit, 1.0 / jnp.maximum(pos_rank, 1).astype(f), 0.0)
    arhr = jnp.mean(jnp.sum(recip, axis=1))
    mrr = jnp.mean(jnp.max(recip, axis=1))

    # --- MAP@k (evaluation.py:120-133) -------------------------------------
    hits_leq = jnp.sum(
        (pos_rank[:, None, :] <= pos_rank[:, :, None])
        & pos_hit[:, None, :] & pos_hit[:, :, None], axis=-1).astype(f)
    prec_at = jnp.where(pos_hit, hits_leq / jnp.maximum(pos_rank, 1)
                        .astype(f), 0.0)
    n_rel_adj = jnp.minimum(n_eval, float(topk))
    mean_ap = jnp.mean(jnp.sum(prec_at, axis=1)
                       / jnp.maximum(n_rel_adj, 1.0))

    # --- nDCG / nDCL (evaluation.py:136-174) -------------------------------
    sort_key = jnp.where(valid, fb, -jnp.inf)
    order = jnp.argsort(sort_key, axis=1, stable=True, descending=True)
    ideal_pos = jnp.argsort(order, axis=1, stable=True) + 1  # 1-based
    disc = jnp.where(rank > 0,
                     1.0 / jnp.log2(1.0 + jnp.maximum(rank, 1).astype(f)),
                     0.0)
    ideal_disc = 1.0 / jnp.log2(1.0 + ideal_pos.astype(f))

    def ndcr(entry_mask, rel):
        rel = jnp.where(entry_mask, rel, 0.0)
        dcr = jnp.sum(rel * disc, axis=1)
        idcr = jnp.sum(rel * ideal_disc, axis=1)
        good = dcr > 0
        return jnp.mean(jnp.where(good, dcr / jnp.where(good, idcr, 1.0),
                                  0.0))

    gain = (jnp.exp2(fb) - 1.0) if alternative else fb
    ndcg = ndcr(pos_entry, gain.astype(f))
    if has_split:
        shifted = fb - switch_positive
        # reference pairs negative relevance with negated discounts
        # (evaluation.py:171-174); flipping both signs keeps the ratio and
        # makes the dcr>0 validity mask meaningful
        loss = -(jnp.exp2(shifted) - 1.0) if alternative else -shifted
        ndcl = ndcr(neg_entry, loss.astype(f))
    else:
        ndcl = jnp.nan

    out = dict(
        hr=hr, arhr=arhr, mrr=mrr, map=mean_ap, ndcg=ndcg, ndcl=ndcl,
        precision=precision, recall=recall, miss_rate=miss_rate,
        fallout=fallout, specifity=specifity,
        tp=jnp.sum(tp), fp=jnp.sum(fp), tn=jnp.sum(tn), fn=jnp.sum(fn),
    )
    if coverage_total:
        # catalog coverage in the same fused pass (semantics of
        # get_experience_scores: padding excluded — documented deviation
        # from the reference's np.unique counting the pad value).  Ids
        # beyond the catalog are excluded too, not clipped onto the last
        # catalog item.
        valid_rec = (recs >= 0) & (recs < coverage_total)
        hit = jnp.zeros((coverage_total,), bool).at[
            jnp.clip(recs, 0, coverage_total - 1)].max(valid_rec)
        out["coverage"] = jnp.sum(hit).astype(f) / coverage_total
    return out


def compute_metrics(recommendations: np.ndarray, holdout: pd.DataFrame,
                    key: str, target: str,
                    feedback: Optional[str] = None,
                    is_positive: Optional[np.ndarray] = None,
                    switch_positive: Optional[float] = None,
                    not_rated_penalty: float = 0.0,
                    topk: Optional[int] = None,
                    alternative: bool = True,
                    coverage_total: Optional[int] = None
                    ) -> Dict[str, float]:
    """All metric families at once; returns a flat dict of floats.

    ``recommendations`` may be a host array or an HBM-resident jax array
    (the models' evaluate() path keeps it on device); with
    ``coverage_total`` set, catalog coverage is computed inside the same
    fused pass."""
    if isinstance(recommendations, jax.Array):
        recs = recommendations      # stays on device — no host round trip
    else:
        recs = np.asarray(recommendations)
    if recs.ndim == 1:
        recs = recs[None, :]
    items, fb, valid, keys, positions = build_holdout_arrays(
        holdout, key, target, feedback, return_positions=True)
    if recs.shape[0] != items.shape[0]:
        raise ValueError(
            f"{recs.shape[0]} recommendation rows vs {items.shape[0]} "
            f"holdout keys — data is misaligned")
    has_split = is_positive is not None
    if has_split:
        is_pos = np.zeros_like(valid)
        is_pos[keys, positions] = np.asarray(is_positive)
    else:
        is_pos = valid
    out = _metrics_core(
        jnp.asarray(recs), jnp.asarray(items), jnp.asarray(fb),
        jnp.asarray(valid), jnp.asarray(is_pos),
        topk=int(topk if topk is not None else recs.shape[1]),
        switch_positive=float(switch_positive or 0.0),
        alternative=bool(alternative), has_split=has_split,
        penalty=float(not_rated_penalty),
        coverage_total=int(coverage_total or 0))
    # one stacked fetch: per-scalar float() would pay one device->host
    # round trip EACH (~30ms through a tunneled backend — the dominant
    # cost of an evaluate() call, not the metric math)
    names = list(out)
    float_dtype = jnp.asarray(0.0).dtype    # f64 under x64, else f32
    stacked = np.asarray(jnp.stack([out[name].astype(float_dtype)
                                    for name in names]))
    return {name: float(value) for name, value in zip(names, stacked)}


def get_experience_scores(recommendations: np.ndarray,
                          total: int) -> Experience:
    recs = np.asarray(recommendations)
    unique = np.unique(recs[recs >= 0])
    return Experience(coverage=len(unique) / total)


def convert_scores_to_series(metrics, name: str = "scores") -> pd.Series:
    """Namedtuple list -> pandas Series (reference ``evaluation.py:256``)."""
    if not isinstance(metrics, list):
        metrics = [metrics]
    records = []
    for tup in metrics:
        records.extend(tup._asdict().items())
    frame = pd.DataFrame.from_records(records, columns=["metric", name])
    return frame.set_index("metric")[name]


# --------------------------------------------------------------------------
# Reference-style per-family accessors (evaluation.py:101-253).  The
# reference passes pre-assembled scipy CSR matrices; here each accessor is
# a thin view over the single fused metrics pass, taking the raw
# (recommendations, holdout) pair instead.
# --------------------------------------------------------------------------

# One-entry memo over the fused pass: reference-style call sequences
# (``get_ranking_scores`` then ``get_relevance_scores`` on the same recs)
# must pay ONE device pass, not one per family — through a tunneled
# backend each extra pass costs a ~30 ms sync.  Keyed on argument
# *identity* (strong refs retained, so ids cannot be recycled).
_family_memo: dict = {}


def _memo_token(v):
    """Hash/compare-safe token: plain scalars by value, everything else
    (pandas Series, lists, arrays) by identity — an object whose ``==``
    is elementwise would make the memo-key comparison raise."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    return id(v)


def _array_token(v):
    """Identity plus a 64-element strided content sample for host arrays:
    catches in-place mutation between calls at negligible cost.  Device
    arrays are immutable, and sampling one would force a device→host
    sync (the ~30 ms the memo exists to avoid) — identity suffices."""
    if isinstance(v, np.ndarray) and v.size:
        idx = np.linspace(0, v.size - 1, num=min(64, v.size),
                          dtype=np.int64)
        return (id(v), v.shape, v.flat[idx].tobytes())
    return id(v)


def _family(recommendations, holdout, key, target, **kwargs):
    arrays = {k: v for k, v in kwargs.items()
              if isinstance(v, (np.ndarray, jax.Array))}
    others = {k: v for k, v in kwargs.items() if k not in arrays}
    scalars = tuple(sorted((k, _memo_token(v)) for k, v in others.items()))
    memo_key = ((_array_token(recommendations), id(holdout))
                + tuple(_array_token(v) for _, v in sorted(arrays.items())),
                key, target, tuple(sorted(arrays)), scalars)
    if _family_memo.get("key") == memo_key:
        return _family_memo["value"]
    value = compute_metrics(recommendations, holdout, key, target, **kwargs)
    _family_memo.update(
        key=memo_key, value=value,
        refs=(recommendations, holdout, tuple(arrays.values()),
              tuple(others.values())))
    return value


def get_hr_score(recommendations, holdout, key, target, **kwargs):
    return SimpleRelevance(hr=_family(recommendations, holdout, key,
                                      target, **kwargs)["hr"])


def get_rr_scores(recommendations, holdout, key, target, **kwargs):
    stats = _family(recommendations, holdout, key, target, **kwargs)
    return SimpleRanking(arhr=stats["arhr"], mrr=stats["mrr"])


def get_arhr_score(recommendations, holdout, key, target, **kwargs):
    return _family(recommendations, holdout, key, target,
                   **kwargs)["arhr"]


def get_mrr_score(recommendations, holdout, key, target, **kwargs):
    return _family(recommendations, holdout, key, target, **kwargs)["mrr"]


def get_map_score(recommendations, holdout, key, target, **kwargs):
    return _family(recommendations, holdout, key, target, **kwargs)["map"]


def get_ndcg_score(recommendations, holdout, key, target, **kwargs):
    return _family(recommendations, holdout, key, target, **kwargs)["ndcg"]


def get_ndcl_score(recommendations, holdout, key, target, **kwargs):
    return _family(recommendations, holdout, key, target, **kwargs)["ndcl"]


def get_ranking_scores(recommendations, holdout, key, target, **kwargs):
    stats = _family(recommendations, holdout, key, target, **kwargs)
    return Ranking(ndcg=stats["ndcg"], ndcl=stats["ndcl"],
                   map=stats["map"], arhr=stats["arhr"])


def get_relevance_scores(recommendations, holdout, key, target, **kwargs):
    stats = _family(recommendations, holdout, key, target, **kwargs)
    return Relevance(precision=stats["precision"], recall=stats["recall"],
                     fallout=stats["fallout"], specifity=stats["specifity"],
                     miss_rate=stats["miss_rate"])


def get_hits(recommendations, holdout, key, target, **kwargs):
    stats = _family(recommendations, holdout, key, target, **kwargs)
    return Hits(true_positive=stats["tp"], false_positive=stats["fp"],
                true_negative=stats["tn"], false_negative=stats["fn"])
