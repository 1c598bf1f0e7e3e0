"""Low-latency serving bundle.

New capability vs the reference (which is research-only): package a
trained factor model into a fixed-shape compiled inference function for
online recommendation serving.  Requests arrive as raw user profiles
(dense rows or event lists); the bundle pads them to a static batch
shape, runs the fused ``(P·V)·Vᵀ → mask seen → top-k`` program, and
returns item ids.  One executable per (batch, topk) — no retracing in
the serving loop.
"""
from __future__ import annotations

from functools import partial
from itertools import chain, repeat
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from polara_tpu.runtime.checkpoint import load_factors, save_factors


@partial(jax.jit, static_argnames=("topk", "filter_seen"))
def _serve_step(right_panel: jax.Array, left_panel: jax.Array,
                profiles: jax.Array, topk: int,
                filter_seen: bool) -> jax.Array:
    # SVD family: right == left == V; HybridSVD: right/left projectors
    scores = (profiles @ right_panel) @ left_panel.T
    if filter_seen:
        scores = jnp.where(profiles > 0, -jnp.inf, scores)
    _, idx = jax.lax.top_k(scores, topk)
    return idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("topk", "filter_seen"))
def _serve_step_events(right_panel: jax.Array, left_panel: jax.Array,
                       item_ids: jax.Array, values: Optional[jax.Array],
                       lengths: jax.Array, topk: int,
                       filter_seen: bool) -> jax.Array:
    """Event-list request path: ships (ids[, values], lengths) instead of
    dense profiles — two orders of magnitude less host→device traffic for
    typical interaction histories.  The validity mask is derived from
    ``lengths`` on device, ``values=None`` means unit weights (implicit
    events), and ids may arrive as int16 when the catalog fits — all three
    shave request-upload bytes, which dominate serving latency."""
    width = item_ids.shape[1]
    valid = jnp.arange(width, dtype=lengths.dtype)[None, :] < lengths[:, None]
    ids = jnp.where(valid, item_ids, 0).astype(jnp.int32)
    if values is None:
        weights = valid.astype(right_panel.dtype)
    else:
        weights = jnp.where(valid, values, 0).astype(right_panel.dtype)
    proj = jnp.einsum("bw,bwr->br", weights, right_panel[ids])
    scores = proj @ left_panel.T                     # (b, n_items)
    if filter_seen:
        rows = jnp.broadcast_to(
            jnp.arange(ids.shape[0])[:, None], ids.shape)
        update = jnp.where(valid, -jnp.inf, jnp.inf)
        scores = scores.at[rows, ids].min(update)
    _, idx = jax.lax.top_k(scores, topk)
    return idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("topk", "filter_seen", "kind",
                                   "weight"))
def _serve_step_foldin(panel: jax.Array, gram: jax.Array,
                       profiles: jax.Array, alpha, epsilon, topk: int,
                       filter_seen: bool, kind: str, weight) -> jax.Array:
    """Implicit-MF request path: fold the profile into the factor space by
    solving the model's own normal system against fixed item factors —
    iALS confidence-weighted (``ops/implicit.ials_fold_in``) or BPR ridge
    (``models/implicit_mf._lstsq_fold_in``) — then score ``x @ Vᵀ``.
    Plain ``p·V·Vᵀ`` projection is wrong for these models: V is not
    orthonormal and the trained warm-start semantics are the solve."""
    from polara_tpu.ops.implicit import confidence

    if kind == "ials":
        cm1 = confidence(profiles, alpha, weight, epsilon)
        rhs = jnp.where(profiles > 0, cm1 + 1.0, 0.0) @ panel
        aw = cm1
    else:                       # "ridge": binary preferences (BPR)
        aw = (profiles > 0).astype(panel.dtype)
        rhs = aw @ panel
    a = gram[None] + jnp.einsum("bi,ik,il->bkl", aw, panel, panel)
    chol = jax.scipy.linalg.cho_factor(a)
    x = jax.scipy.linalg.cho_solve(chol, rhs[..., None])[..., 0]
    scores = x @ panel.T
    if filter_seen:
        scores = jnp.where(profiles > 0, -jnp.inf, scores)
    _, idx = jax.lax.top_k(scores, topk)
    return idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("topk", "filter_seen", "kind",
                                   "weight"))
def _serve_step_events_foldin(panel: jax.Array, gram: jax.Array,
                              item_ids: jax.Array,
                              values: Optional[jax.Array],
                              lengths: jax.Array, alpha, epsilon,
                              topk: int, filter_seen: bool, kind: str,
                              weight) -> jax.Array:
    """Event-list variant of :func:`_serve_step_foldin`: assembles the
    per-request normal system straight from the (ids, values) history —
    peak intermediate is (batch, width, rank), never (batch, n_items)."""
    from polara_tpu.ops.implicit import confidence

    width = item_ids.shape[1]
    valid = jnp.arange(width, dtype=lengths.dtype)[None, :] < lengths[:, None]
    ids = jnp.where(valid, item_ids, 0).astype(jnp.int32)
    v_ids = panel[ids]                               # (b, w, r)
    if kind == "ials":
        vals = (jnp.ones(ids.shape, panel.dtype) if values is None
                else values.astype(panel.dtype))
        vals = jnp.where(valid, vals, 0.0)
        cm1 = confidence(vals, alpha, weight, epsilon)
        w_rhs = jnp.where(vals > 0, cm1 + 1.0, 0.0)
        aw = cm1
    else:
        aw = valid.astype(panel.dtype)
        w_rhs = aw
    rhs = jnp.einsum("bw,bwr->br", w_rhs, v_ids)
    a = gram[None] + jnp.einsum("bw,bwk,bwl->bkl", aw, v_ids, v_ids)
    chol = jax.scipy.linalg.cho_factor(a)
    x = jax.scipy.linalg.cho_solve(chol, rhs[..., None])[..., 0]
    scores = x @ panel.T
    if filter_seen:
        rows = jnp.broadcast_to(
            jnp.arange(ids.shape[0])[:, None], ids.shape)
        update = jnp.where(valid, -jnp.inf, jnp.inf)
        scores = scores.at[rows, ids].min(update)
    _, idx = jax.lax.top_k(scores, topk)
    return idx.astype(jnp.int32)


class ServingBundle:
    """Compiled top-k recommender over fixed item factors.

    ``batch_size`` fixes the compiled request shape; smaller request
    batches are padded (and the padding rows discarded).
    """

    def __init__(self, item_factors, topk: int = 10,
                 filter_seen: bool = True, batch_size: int = 256,
                 dtype=jnp.float32, left_panel=None,
                 value_map: Optional[dict] = None,
                 default_weight: float = 1.0,
                 fold_in: Optional[dict] = None):
        self.item_factors = jnp.asarray(item_factors, dtype)
        self.left_panel = (jnp.asarray(left_panel, dtype)
                           if left_panel is not None
                           else self.item_factors)
        self.topk = int(topk)
        self.filter_seen = bool(filter_seen)
        self.batch_size = int(batch_size)
        # implicit-MF warm-start semantics: {"kind": "ials", "alpha",
        # "weight", "epsilon", "reg"} or {"kind": "ridge", "reg"}.
        # None = plain p·V·Vᵀ projection (SVD family).
        self.fold_in = None
        self._gram = None
        if fold_in is not None:
            if value_map is not None:
                raise ValueError("fold_in and value_map are mutually "
                                 "exclusive serving modes")
            kind = fold_in.get("kind")
            if kind not in ("ials", "ridge"):
                raise ValueError(f"unknown fold_in kind {kind!r}")
            spec = {"kind": kind, "reg": float(fold_in.get("reg", 0.01))}
            if kind == "ials":
                from polara_tpu.ops.implicit import (canonical_weight,
                                                     confidence)
                spec["alpha"] = float(fold_in.get("alpha", 1.0))
                spec["epsilon"] = float(fold_in.get("epsilon", 1.0))
                spec["weight"] = canonical_weight(
                    fold_in.get("weight", "log2"))
                if callable(spec["weight"]):
                    # the serve steps are jitted — a numpy-based callable
                    # raises deep inside the first request; surface it now
                    try:
                        jax.eval_shape(
                            lambda v: confidence(v, spec["alpha"],
                                                 spec["weight"],
                                                 spec["epsilon"]),
                            jax.ShapeDtypeStruct((1,), jnp.float32))
                    except Exception as err:
                        raise ValueError(
                            "fold-in confidence weight callable is not "
                            "jit-traceable; use a named weight ('log2', "
                            "'log', 'linear', 'sqrt') or a jax-traceable "
                            "callable") from err
            self.fold_in = spec
            v = self.item_factors
            eye = spec["reg"] * jnp.eye(v.shape[1], dtype=v.dtype)
            # iALS carries the full VᵀV Gram (unit baseline confidence on
            # the unobserved entries); the BPR ridge solves only over the
            # seen set (``models/implicit_mf._lstsq_fold_in``)
            self._gram = (v.T @ v + eye) if kind == "ials" else eye
        # CoFFee-style collapsed scoring: raw rating -> per-level scalar
        # weight (``models/coffee.py:142-154``); None = identity (SVD/MF
        # raw ratings).  ``default_weight`` applies to implicit requests
        # (bare item-id lists) — for CoFFee it is the top level's weight,
        # matching the reference's fake-user convention
        # (``polara/recommender/models.py:344-348`` assigns the max
        # training feedback value).
        self.value_map = (None if value_map is None
                          else {float(k): float(v)
                                for k, v in value_map.items()})
        self.default_weight = float(default_weight)

    def _fold_in_args(self):
        """Shared trailing argument tuple of the fold-in serve steps."""
        return (self.fold_in.get("alpha", 0.0),
                self.fold_in.get("epsilon", 1.0),
                self.topk, self.filter_seen, self.fold_in["kind"],
                self.fold_in.get("weight"))

    @property
    def n_items(self) -> int:
        return self.item_factors.shape[0]

    @classmethod
    def from_model(cls, model, topk: Optional[int] = None,
                   **kwargs) -> "ServingBundle":
        """Bundle a trained SVD-family/MF model (anything whose scoring
        is ``profiles @ V @ Vᵀ`` over item factors), a CoFFee model
        (scoring collapses to the same shape with per-rating scalar
        weights, ``models/coffee.py:142-154``), or an implicit-MF model
        (iALS/BPR — served through their warm-start fold-in solve, not
        projection)."""
        itemid = model.data.fields.itemid
        topk = topk if topk is not None else model.topk
        if hasattr(model, "_fold_in_users"):
            # implicit family: replicate the model's own warm-start
            # semantics (``models/implicit_mf.py:61-77``)
            factors = model.factors.get(itemid)
            if factors is None:
                raise ValueError(f"{model.method} has no item factors; "
                                 "build() first")
            if hasattr(model, "weight_func"):       # iALS
                fold_in = {"kind": "ials", "alpha": model.alpha,
                           "epsilon": model.epsilon,
                           "weight": model.weight_func,
                           "reg": model.regularization}
            else:                                    # BPR-style ridge
                fold_in = {"kind": "ridge",
                           "reg": model.regularization}
            return cls(factors, topk=topk, filter_seen=model.filter_seen,
                       fold_in=fold_in, **kwargs)
        left = None
        factors = model.factors.get(f"{itemid}_projector_right")
        if factors is not None:  # HybridSVD: asymmetric projectors
            left = model.factors.get(f"{itemid}_projector_left")
        elif "core" in model.factors and hasattr(model, "flattener"):
            # CoFFee: item panel both sides; request ratings map to the
            # collapsed level weights alpha_f = w[f] . flatten(w)
            params = model.score_params()
            level_weights = np.asarray(params["level_weights"], np.float64)
            fb_index = model.data.index.feedback
            value_map = {float(old): float(level_weights[int(new)])
                         for old, new in zip(fb_index["old"].values,
                                             fb_index["new"].values)}
            top_level = int(fb_index.loc[fb_index["old"].idxmax(), "new"])
            return cls(params["item_panel"], topk=topk,
                       filter_seen=model.filter_seen,
                       value_map=value_map,
                       default_weight=float(level_weights[top_level]),
                       **kwargs)
        else:
            factors = model.factors.get(itemid)
        if factors is None:
            raise ValueError(f"{model.method} has no item factors; "
                             "build() first")
        return cls(factors, topk=topk,
                   filter_seen=model.filter_seen, left_panel=left,
                   **kwargs)

    def warmup(self, event_widths: Sequence[int] = (128,),
               explicit_values: bool = False) -> None:
        """Trigger compilation ahead of the first request.

        Compiles both the dense-profile step and the event-list step —
        the event path compiles one executable per (power-of-two history
        width, implicit/explicit values), so pass the ``event_widths``
        buckets your traffic will hit (e.g. ``(64, 128, 256)``; a width-w
        bucket serves histories of up to w events) and set
        ``explicit_values=True`` to also pre-compile the rating-dict
        variant.  Unlisted shapes still work; they just compile on first
        use."""
        dummy = jnp.zeros((self.batch_size, self.n_items),
                          self.item_factors.dtype)
        if self.fold_in is not None:
            jax.block_until_ready(_serve_step_foldin(
                self.item_factors, self._gram, dummy,
                *self._fold_in_args()))
        else:
            jax.block_until_ready(_serve_step(self.item_factors,
                                              self.left_panel, dummy,
                                              self.topk, self.filter_seen))
        # a value map turns every request into weighted events
        explicit_values = explicit_values or self.value_map is not None
        ids_dtype = self._wire_ids_dtype()
        lengths = jnp.zeros((self.batch_size,), jnp.int32)
        for width in event_widths:
            ids = jnp.zeros((self.batch_size, int(width)), ids_dtype)
            variants = [None]
            if explicit_values:
                variants.append(
                    jnp.zeros((self.batch_size, int(width)), jnp.float32))
            for values in variants:
                if self.fold_in is not None:
                    jax.block_until_ready(_serve_step_events_foldin(
                        self.item_factors, self._gram, ids, values,
                        lengths, *self._fold_in_args()))
                else:
                    jax.block_until_ready(_serve_step_events(
                        self.item_factors, self.left_panel, ids, values,
                        lengths, self.topk, self.filter_seen))

    def _map_request_values(self, values: np.ndarray) -> np.ndarray:
        """Map raw request ratings through ``value_map`` (CoFFee level
        weights).  Unknown ratings are rejected — they have no trained
        feedback level (mirrors the tensor-mode mapping guard in
        ``data/dataset.py:627-629``)."""
        # match in the wire dtype (f32): request values are f32-quantized
        # on assembly, so comparing against f64 keys would reject levels
        # not exactly representable in f32 (e.g. 0.1)
        keys = np.asarray(sorted(self.value_map), np.float32)
        weights = np.asarray([self.value_map[k]
                              for k in sorted(self.value_map)], np.float32)
        values = np.asarray(values, np.float32)
        pos = np.clip(np.searchsorted(keys, values), 0, len(keys) - 1)
        known = keys[pos] == values
        if not known.all():
            bad = np.unique(np.asarray(values)[~known])
            raise ValueError(f"request feedback values {bad.tolist()} are "
                             "absent from the trained feedback levels")
        return weights[pos]

    def _wire_ids_dtype(self):
        """Smallest integer encoding for item ids on the request wire."""
        return (np.int16 if self.n_items <= np.iinfo(np.int16).max
                else np.int32)

    def recommend_events(self, events: Sequence) -> np.ndarray:
        """Top-k for per-user event lists (item-id lists or
        {item: rating} dicts) without materializing dense profiles —
        the low-bandwidth request path."""
        n = len(events)
        if n == 0:
            return np.empty((0, self.topk), dtype=np.int32)
        # Vectorized request assembly: one C-speed pass over the flattened
        # events (per-user numpy allocation is the latency floor on slow
        # hosts), then a single fancy-indexed scatter into the padded block.
        events = [e if isinstance(e, dict) or hasattr(e, "__len__")
                  else list(e) for e in events]
        lengths = np.fromiter((len(e) for e in events), np.int64, n)
        total = int(lengths.sum())
        flat_ids = np.fromiter(
            chain.from_iterable(e.keys() if isinstance(e, dict) else e
                                for e in events), np.int64, total)
        if any(isinstance(e, dict) for e in events):
            flat_vals = np.fromiter(
                chain.from_iterable(
                    e.values() if isinstance(e, dict)
                    else repeat(1.0, len(e)) for e in events),
                np.float32, total)
            # all-unit-weight collapse is an optimization for the plain
            # factor path only: under a value_map a literal rating of 1.0
            # must still map through its trained level weight, NOT the
            # implicit default (the top level's weight)
            if self.value_map is None and (flat_vals == 1.0).all():
                flat_vals = None
        else:
            flat_vals = None    # item-id lists: implicit unit weights

        if total and not (0 <= flat_ids.min()
                          and flat_ids.max() < self.n_items):
            raise ValueError(
                f"event item ids must lie in [0, {self.n_items}); got "
                f"range [{flat_ids.min()}, {flat_ids.max()}] — out-of-range"
                " ids would silently wrap in the compact wire encoding")

        if self.value_map is not None and total:
            if flat_vals is None:        # implicit requests: top-level weight
                if self.default_weight != 1.0:
                    flat_vals = np.full(total, self.default_weight,
                                        np.float32)
            else:
                # mixed batches: only dict events carry real ratings;
                # item-id lists are implicit and take default_weight,
                # never the 1.0-level weight (1.0 may not even be a
                # trained level)
                explicit = np.fromiter(
                    chain.from_iterable(
                        repeat(isinstance(e, dict), len(e))
                        for e in events), bool, total)
                mapped = np.full(total, self.default_weight, np.float32)
                if explicit.any():
                    mapped[explicit] = self._map_request_values(
                        flat_vals[explicit])
                flat_vals = mapped

        width = max(1, int(lengths.max()) if n else 1)
        width = 1 << (width - 1).bit_length()   # bucket to powers of two
        ids_dtype = self._wire_ids_dtype()
        row_idx = np.repeat(np.arange(n), lengths)
        col_idx = np.arange(total) - np.repeat(
            np.cumsum(lengths) - lengths, lengths)
        item_ids = np.zeros((n, width), ids_dtype)
        item_ids[row_idx, col_idx] = flat_ids
        if flat_vals is not None:
            values = np.zeros((n, width), np.float32)
            values[row_idx, col_idx] = flat_vals
        lengths32 = lengths.astype(np.int32)

        out = np.empty((n, self.topk), dtype=np.int32)
        for start in range(0, n, self.batch_size):
            stop = min(start + self.batch_size, n)
            pad = ((0, self.batch_size - (stop - start)), (0, 0))
            ids_b = jnp.asarray(np.pad(item_ids[start:stop], pad))
            vals_b = (None if flat_vals is None
                      else jnp.asarray(np.pad(values[start:stop], pad)))
            lens_b = jnp.asarray(np.pad(lengths32[start:stop], pad[0]))
            if self.fold_in is not None:
                recs = _serve_step_events_foldin(
                    self.item_factors, self._gram, ids_b, vals_b, lens_b,
                    *self._fold_in_args())
            else:
                recs = _serve_step_events(
                    self.item_factors, self.left_panel, ids_b, vals_b,
                    lens_b, self.topk, self.filter_seen)
            out[start:stop] = np.asarray(recs)[: stop - start]
        return out

    def recommend(self, profiles) -> np.ndarray:
        """Top-k item ids per request row.

        ``profiles``: (n, n_items) array, or a sequence of per-user
        item-id lists / {item: rating} dicts (routed through the
        low-bandwidth event path).  A row is treated as an event list
        only when it cannot be a dense profile row (a dict, or a short
        list) — pass dense matrices as arrays and prefer
        :meth:`recommend_events` for explicit event requests.
        """
        if not isinstance(profiles, (np.ndarray, jax.Array)):
            rows = list(profiles)
            looks_like_events = rows and all(
                isinstance(r, dict)
                or (hasattr(r, "__len__") and len(r) != self.n_items)
                for r in rows)
            if not rows or looks_like_events:
                return self.recommend_events(rows)
            raise ValueError(
                "ambiguous request: rows of length n_items could be "
                "dense profiles or event lists — pass a numpy array for "
                "profiles, or call recommend_events() for event lists")
        profiles = np.asarray(profiles)
        if profiles.ndim == 1:
            profiles = profiles[None, :]
        if self.value_map is not None:
            # CoFFee: ratings must map to level weights AND the seen mask
            # must key on raw interactions (a level weight can be
            # negative) — the event path handles both, so route dense
            # requests through it
            rows, cols = np.nonzero(profiles)
            split = np.searchsorted(rows, np.arange(1, profiles.shape[0]))
            events = [dict(zip(c.tolist(), v.tolist()))
                      for c, v in zip(np.split(cols, split),
                                      np.split(profiles[rows, cols], split))]
            return self.recommend_events(events)
        n = profiles.shape[0]

        out = np.empty((n, self.topk), dtype=np.int32)
        for start in range(0, n, self.batch_size):
            stop = min(start + self.batch_size, n)
            block = np.zeros((self.batch_size, self.n_items))
            block[: stop - start] = profiles[start:stop]
            block_d = jnp.asarray(block, self.item_factors.dtype)
            if self.fold_in is not None:
                recs = _serve_step_foldin(
                    self.item_factors, self._gram, block_d,
                    *self._fold_in_args())
            else:
                recs = _serve_step(self.item_factors, self.left_panel,
                                   block_d, self.topk, self.filter_seen)
            out[start:stop] = np.asarray(recs)[: stop - start]
        return out

    # --- persistence ----------------------------------------------------------

    def save(self, path: str) -> None:
        factors = {"item_factors": self.item_factors}
        if self.left_panel is not self.item_factors:
            factors["left_panel"] = self.left_panel
        meta = {"topk": self.topk,
                "filter_seen": self.filter_seen,
                "batch_size": self.batch_size,
                "kind": "ServingBundle"}
        if self.value_map is not None:
            keys = sorted(self.value_map)
            # host numpy, NOT jnp: with jax x64 disabled (the serving
            # default) a jnp.float64 request silently becomes f32 and a
            # save/load round-trip would change the accepted rating keys
            factors["value_map_keys"] = np.asarray(keys, np.float64)
            factors["value_map_weights"] = np.asarray(
                [self.value_map[k] for k in keys], np.float64)
            meta["default_weight"] = self.default_weight
        if self.fold_in is not None:
            if callable(self.fold_in.get("weight")):
                raise ValueError(
                    "cannot persist a bundle whose fold-in confidence "
                    "weight is a custom callable; use a named weight "
                    "('log2', 'log', 'linear', 'sqrt')")
            meta["fold_in"] = dict(self.fold_in)
        save_factors(path, factors, meta)

    @classmethod
    def load(cls, path: str) -> "ServingBundle":
        factors, meta = load_factors(path)
        value_map = None
        if "value_map_keys" in factors:
            value_map = dict(zip(np.asarray(factors["value_map_keys"],
                                            np.float64).tolist(),
                                 np.asarray(factors["value_map_weights"],
                                            np.float64).tolist()))
        return cls(factors["item_factors"], topk=meta["topk"],
                   filter_seen=meta["filter_seen"],
                   batch_size=meta["batch_size"],
                   left_panel=factors.get("left_panel"),
                   value_map=value_map,
                   default_weight=float(meta.get("default_weight", 1.0)),
                   fold_in=meta.get("fold_in"))
