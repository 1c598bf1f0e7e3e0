"""HBM-aware static chunk planning.

Counterpart of the reference's free-RAM-driven chunker
(``polara/recommender/utils.py:7-53``): the reference solves for the largest
test-user chunk whose dense score matrix fits in free host memory at call
time.  Under XLA shapes must be static, so we plan the chunk grid ahead
of time against a fixed HBM budget and round chunk sizes to hardware-friendly
multiples (8 sublanes for f32).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from polara_tpu.config import get_default

_LANE = 128
_SUBLANE = 8


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def range_division(total: int, chunk: int) -> List[int]:
    """Split points covering ``[0, total]`` in steps of ``chunk``."""
    bounds = list(range(0, total, chunk)) + [total]
    if bounds[-2] == bounds[-1]:
        bounds.pop()
    return bounds


def plan_user_chunks(n_users: int, n_items: int,
                     scores_multiplier: int = 1,
                     itemsize: int = 4,
                     budget_gb: float | None = None,
                     max_chunk: int | None = None,
                     n_shards: int = 1) -> List[Tuple[int, int]]:
    """Plan (start, stop) user slices whose dense score block fits the budget.

    ``scores_multiplier`` inflates the estimate for models whose intermediate
    scores carry an extra axis (the tensor model's feedback mode — reference
    ``models.py:214-221``).

    ``n_shards`` is the mesh users-axis size: the score block is row-sharded
    across the mesh, so the per-device budget covers ``n_shards`` times as
    many rows (mirrors the dense-matrix budget scaling in
    ``models/svd.py``) and chunk sizes round to shard-aligned multiples.
    """
    budget = (budget_gb if budget_gb is not None
              else get_default("hbm_score_budget_gb")) * (1024 ** 3)
    budget *= max(int(n_shards), 1)
    row_bytes = n_items * scores_multiplier * itemsize
    chunk = int(budget // max(row_bytes, 1))
    if chunk <= 0:
        raise MemoryError(
            f"A single score row ({row_bytes} bytes) exceeds the HBM budget; "
            "raise hbm_score_budget_gb.")
    chunk = min(chunk, n_users)
    if max_chunk is not None:
        chunk = min(chunk, max_chunk)
    align = _SUBLANE * max(int(n_shards), 1)
    chunk = max(align, round_up(chunk, align) if chunk >= align else chunk)
    bounds = range_division(n_users, chunk)
    return list(zip(bounds[:-1], bounds[1:]))


def pad_dim(n: int, lane_align: bool = True) -> int:
    """Pad a trailing dimension to the 128-lane grid (TPU tiling)."""
    return round_up(max(n, 1), _LANE if lane_align else _SUBLANE)


def read_npz_from_url(url: str):
    """Load an npz archive over HTTP (reference
    ``polara/recommender/utils.py:56-60``); requires network egress."""
    import io
    from urllib.request import urlopen

    import numpy as np
    with urlopen(url) as response:
        return np.load(io.BytesIO(response.read()))


def get_available_memory() -> float:
    """Available host RAM in bytes (reference
    ``polara/tools/systools.py:13-57``); psutil when present, /proc
    fallback on Linux."""
    try:
        import psutil
        return float(psutil.virtual_memory().available)
    except ImportError:
        pass
    try:
        with open("/proc/meminfo") as handle:
            for line in handle:
                if line.startswith("MemAvailable:"):
                    return float(line.split()[1]) * 1024.0
    except OSError:
        pass
    raise RuntimeError("cannot determine available memory on this platform")


def get_chunk_size(n_rows: int, n_cols: int, scores_multiplier: int = 1,
                   budget_gb: float | None = None) -> int:
    """Largest row-chunk whose dense score block fits the budget
    (reference ``polara/recommender/utils.py:16-47``); thin wrapper over
    the static planner."""
    bounds = plan_user_chunks(n_rows, n_cols,
                              scores_multiplier=scores_multiplier,
                              budget_gb=budget_gb)
    return bounds[0][1] - bounds[0][0]


def array_split(n_rows: int, n_cols: int, scores_multiplier: int = 1,
                budget_gb: float | None = None) -> List[int]:
    """Chunk-boundary list like the reference's ``array_split``
    (``utils.py:50-53``): [0, c, 2c, ..., n_rows]."""
    chunk = get_chunk_size(n_rows, n_cols,
                           scores_multiplier=scores_multiplier,
                           budget_gb=budget_gb)
    return range_division(n_rows, chunk)
