"""Device-mesh helpers.

The reference framework is single-process CPU with thread-level parallelism
over test-user slices (``polara/recommender/models.py:374-405``).  The
TPU-native equivalent is a ``jax.sharding.Mesh``: test users (and training
matrix rows) shard over the ``users`` axis; rank-r factor panels may
optionally shard over a second ``model`` axis.  All collectives are inserted
by GSPMD from sharding annotations, riding ICI within a slice.
"""
from __future__ import annotations

import contextlib
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Framework-wide default mesh.  When set, every model built afterwards
# (without an explicit ``mesh=`` argument) routes its factorization and
# scoring through the distributed paths — the pod-scale counterpart of the
# reference's global ``max_test_workers`` thread-pool knob
# (``polara/recommender/defaults.py:52``, ``models.py:374-405``).
_DEFAULT_MESH: Optional[Mesh] = None


def set_default_mesh(mesh: Optional[Mesh]) -> None:
    """Install (or clear, with ``None``) the framework-wide default mesh."""
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh


def get_default_mesh() -> Optional[Mesh]:
    return _DEFAULT_MESH


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]) -> Iterator[Optional[Mesh]]:
    """Scoped default mesh: models without an explicit ``mesh=`` that build
    or score inside the block run distributed over it."""
    global _DEFAULT_MESH
    saved = _DEFAULT_MESH
    _DEFAULT_MESH = mesh
    try:
        yield mesh
    finally:
        _DEFAULT_MESH = saved


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = ("users", "model"),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over available devices.

    By default all devices go onto the data-parallel ``users`` axis with a
    trivial ``model`` axis — recommender scoring is embarrassingly parallel
    over users, and factor panels are small enough to replicate.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def user_sharding(mesh: Mesh) -> NamedSharding:
    """Rows sharded over the ``users`` axis, columns replicated."""
    return NamedSharding(mesh, P(mesh.axis_names[0], None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def shard_rows(array: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a 2-D array with rows split across the ``users`` mesh axis.

    Pads rows up to a multiple of the axis size (callers carry the true row
    count and mask padded rows out of reductions).
    """
    axis = mesh.axis_names[0]
    per = mesh.shape[axis]
    n = array.shape[0]
    padded = pad_to_multiple(n, per)
    if padded != n:
        pad_width = [(0, padded - n)] + [(0, 0)] * (array.ndim - 1)
        array = jax.numpy.pad(array, pad_width)
    spec = P(axis, *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))
