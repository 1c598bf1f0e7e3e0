import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware.  Must be set before jax import.
# Force-override: the harness environment pins JAX_PLATFORMS to the real
# TPU tunnel, which tests must not touch — and sitecustomize imports jax at
# interpreter startup, so env vars alone are too late.  Update the live jax
# config instead (backends are not instantiated until first use).
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                           + os.environ.get("XLA_FLAGS", ""))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "true"

import jax

jax.config.update("jax_platforms", "cpu")
# x64 brings CPU tests numerically close to the f64 reference; the library
# stays dtype-explicit so the TPU f32 path is unaffected.
jax.config.update("jax_enable_x64", True)

import numpy as np
import pandas as pd
import pytest


@pytest.fixture
def tiny_timeline():
    """7-event, 3-user synthetic timeline (style of the reference fixture
    ``tests/dataset_fixtures.py:6-22``)."""
    return pd.DataFrame({
        "userid": [0, 0, 0, 1, 1, 1, 2],
        "movieid": [0, 1, 2, 0, 1, 2, 0],
        "rating": [5, 4, 3, 4, 5, 2, 4],
        "timestamp": [1, 2, 3, 4, 5, 6, 7],
    })


def make_synthetic_interactions(n_users=60, n_items=40, density=0.3,
                                seed=0, min_items=4):
    """Random explicit-feedback dataset with ratings 1..5."""
    rs = np.random.RandomState(seed)
    rows = []
    for u in range(n_users):
        n = max(min_items, rs.binomial(n_items, density))
        items = rs.choice(n_items, size=n, replace=False)
        ratings = rs.randint(1, 6, size=n)
        for i, r in zip(items, ratings):
            rows.append((u, i, r))
    df = pd.DataFrame(rows, columns=["userid", "movieid", "rating"])
    return df


@pytest.fixture
def synthetic_interactions():
    return make_synthetic_interactions()
