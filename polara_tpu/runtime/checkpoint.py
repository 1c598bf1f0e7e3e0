"""Factor checkpointing: first-class serializable model artifacts.

The reference keeps factors in an in-memory dict with no persistence
(SURVEY §5.4); the only reuse mechanism is rank truncation.  Here factors
are a savable artifact: a single ``.npz`` with a JSON metadata record, so
experiments resume without retraining while the rank-truncation trick
keeps working on the loaded factors.  (The format is deliberately plain
npz, not orbax — factors are small dense panels, and npz round-trips
through numpy with zero extra dependencies.)
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

_META_KEY = "__polara_meta__"
_NONE_KEY = "__none__:"


def save_factors(path: str, factors: Dict[str, Any],
                 meta: Optional[Dict[str, Any]] = None) -> None:
    """Persist a factors dict (values: arrays or None) plus metadata."""
    arrays = {}
    none_keys = []
    for key, value in factors.items():
        if value is None:
            none_keys.append(key)
        else:
            arrays[key] = np.asarray(value)
    record = {"none_keys": none_keys, "meta": meta or {}}
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(record).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_factors(path: str, device: bool = True
                 ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a factors dict saved by :func:`save_factors`.

    With ``device`` the arrays come back as jax arrays (HBM-resident on
    TPU), otherwise numpy.
    """
    with np.load(path, allow_pickle=False) as data:
        record = json.loads(bytes(data[_META_KEY]).decode())
        factors: Dict[str, Any] = {}
        for key in data.files:
            if key == _META_KEY:
                continue
            factors[key] = (jnp.asarray(data[key]) if device
                            else data[key])
    for key in record["none_keys"]:
        factors[key] = None
    return factors, record["meta"]


def save_factors_orbax(path: str, factors: Dict[str, Any],
                       meta: Optional[Dict[str, Any]] = None) -> None:
    """Orbax backend: sharded/multi-host-friendly factor checkpoints.

    Use for pod-scale factor sets; the npz backend stays the default for
    single-host artifacts.
    """
    import orbax.checkpoint as ocp

    payload = {"factors": {k: v for k, v in factors.items()
                           if v is not None},
               "none_keys": [k for k, v in factors.items() if v is None],
               "meta": meta or {}}
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(os.path.abspath(path), payload)


def load_factors_orbax(path: str) -> Tuple[Dict[str, Any],
                                           Dict[str, Any]]:
    import orbax.checkpoint as ocp

    checkpointer = ocp.PyTreeCheckpointer()
    payload = checkpointer.restore(os.path.abspath(path))
    factors = {k: jnp.asarray(v) for k, v in payload["factors"].items()}
    for key in payload["none_keys"]:
        factors[key] = None
    return factors, dict(payload["meta"])
