"""Global configuration registry.

TPU-native counterpart of the reference config module
(``polara/recommender/defaults.py:1-60``): a flat registry of named defaults,
grouped by subsystem, readable in bulk via :func:`get_config`.  Unlike the
reference (which stores config as module globals and reflects over the module),
we keep an explicit dict so the registry is picklable, copyable per-experiment
and safe to mutate in tests.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable

# --- data splitting ---------------------------------------------------------
_DEFAULTS: Dict[str, Any] = dict(
    # properties that require rebuilding test data
    test_ratio=0.2,        # fraction of users reserved for the test fold
    test_fold=5,           # which fold of users to use as the test fold
    shuffle_data=False,    # randomly permute all records in initial data
    test_sample=None,      # cap per-user testset size; negative samples low-rated
    warm_start=True,       # make train and test disjoint by users
    holdout_size=3,        # number of items hidden from each test user
    permute_tops=False,    # shuffle before top selection to break ties randomly
    random_holdout=False,  # sample evaluation items randomly instead of tops
    negative_prediction=False,  # put negative feedback into evaluation set

    # --- models -------------------------------------------------------------
    feedback_threshold=None,
    switch_positive=None,  # feedback below this value counts as negative
    verify_integrity=True,
    svd_rank=10,
    mlrank=(13, 10, 2),
    growth_tol=1e-4,
    num_iters=25,
    show_output=False,
    flattener=slice(0, None),

    # --- recommendations ----------------------------------------------------
    topk=10,
    filter_seen=True,

    # --- evaluation ---------------------------------------------------------
    ndcg_alternative=True,  # exponential instead of linear relevance in nDCG

    # --- computation --------------------------------------------------------
    # Static device-side chunking of the (test_users x items) score block.
    # The reference sizes chunks from free host RAM at runtime
    # (polara/recommender/utils.py:16-47); on TPU shapes must be static, so we
    # size chunks against an HBM budget instead.
    score_block_users=4096,     # test-user rows per scoring block
    hbm_score_budget_gb=4.0,    # soft cap for a single score block in HBM
    compute_dtype="float32",    # dtype of device-side factor/score math
    device_mesh_axes=("users", "model"),
    # fused Pallas score->mask->top-k backend: "auto" uses it on TPU for
    # factor models when topk <= 128; True forces (interpret on CPU);
    # False always uses the XLA path
    pallas_scoring="auto",
    # fused-backend item layout: "popularity" permutes the item panel to
    # descending interaction count and arms the kernel's tile-skip merge
    # guard (measured 1.5-1.8x on the scoring phase at ML-10M,
    # benchmarks/tile_skip_ab.py; top-k set unchanged, equal-score ties
    # resolve toward the popular item).  None keeps catalog order.
    fused_item_order="popularity",
    # beyond-HBM streaming tier: route the Zipf head of the event stream
    # through a dense (users x P) block on the MXU instead of the gather
    # engine (ops/sparse.py:split_coo_operator).  The head block is
    # budgeted separately from the score block; the split declines
    # automatically when item margins are too flat to pay.
    streaming_split_head=True,
    # 2 GiB head = P=4352 / ~65% event coverage at Netflix geometry —
    # measured r5 on chip: build+score 1.745s vs 3.610s tiled (2.07x,
    # benchmarks/results_r05.json), while a 4 GiB head OOMs once the
    # seen bitmask and factor panels are resident next to it (the
    # benchmark chip exposes ~8 GiB usable HBM)
    streaming_head_gb=2.0,
)


def get_config(params: Iterable[str]) -> Dict[str, Any]:
    """Return ``{name: default}`` for the requested parameter names."""
    return {name: _DEFAULTS[name] for name in params}


def get_default(name: str) -> Any:
    return _DEFAULTS[name]


def set_default(name: str, value: Any) -> None:
    """Override a global default (affects objects created afterwards)."""
    if name not in _DEFAULTS:
        raise KeyError(f"Unknown config parameter: {name!r}")
    _DEFAULTS[name] = value


def defaults_snapshot() -> Dict[str, Any]:
    return dict(_DEFAULTS)
