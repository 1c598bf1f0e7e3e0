"""Randomness discipline.

Two worlds coexist:

* host-side (pandas splitting, tie shuffling) uses ``numpy.random.RandomState``
  exactly like the reference (``polara/tools/random.py:3-21``) so that data
  splits are bit-identical for a given seed;
* device-side uses ``jax.random`` key folding.

``check_random_state`` mirrors the reference helper; ``key_from_seed`` and
``split_like`` are the JAX-side additions.
"""
from __future__ import annotations

from typing import Optional, Union

import numpy as np
import jax


def check_random_state(random_state: Union[None, int, np.random.RandomState]
                       ) -> np.random.RandomState:
    if random_state is None:
        return np.random.RandomState()
    if isinstance(random_state, int):
        return np.random.RandomState(random_state)
    if isinstance(random_state, np.random.RandomState):
        return random_state
    raise ValueError(f"Cannot use {random_state!r} to seed RandomState")


def random_seeds(num: int, entropy: Optional[int] = None) -> np.ndarray:
    """Independent 32-bit seeds from one entropy source (SeedSequence)."""
    return np.random.SeedSequence(entropy).generate_state(num)


def key_from_seed(seed: Optional[int]) -> jax.Array:
    """A jax PRNG key from an optional integer seed (0 if None)."""
    return jax.random.key(0 if seed is None else int(seed) & 0x7FFFFFFF)


def fold_in_name(key: jax.Array, name: str) -> jax.Array:
    """Deterministically derive a subkey from a string tag."""
    h = 2166136261
    for ch in name.encode():
        h = ((h ^ ch) * 16777619) & 0x7FFFFFFF
    return jax.random.fold_in(key, h)


def seed_generator(seed=None):
    """Infinite stream of fresh integer seeds (reference
    ``polara/tools/random.py:17-21``, draw-for-draw compatible) — spawn
    one per worker/thread.  ``gen.send(new_seed)`` reseeds the stream,
    matching the reference's coroutine protocol."""
    rs = np.random.RandomState(seed)
    max_int = np.iinfo(np.int32).max
    while True:
        new_seed = yield rs.randint(max_int)
        if new_seed is not None:
            rs = np.random.RandomState(new_seed)
