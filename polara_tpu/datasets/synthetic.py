"""Synthetic interaction generator.

Not present in the reference — added because this framework targets
egress-free TPU environments: benchmarks and integration tests need
realistically shaped interaction logs without downloading archives.
Generates a low-rank-plus-noise preference structure with a power-law
item popularity profile, so factor models have signal to find.
"""
from __future__ import annotations

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
