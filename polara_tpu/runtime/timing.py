"""Wall-clock timing helpers (reference: ``polara/tools/timing.py:9-34``).

Additions over the reference: ``block_until_ready`` support so that timings of
JAX computations measure actual device execution instead of async dispatch, and
an optional hook into ``jax.profiler`` traces.
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import List, Optional

import jax


def format_elapsed_time(seconds: float) -> str:
    if seconds < 1e-3:
        return f"{seconds * 1e6:.0f}µs"
    if seconds < 1:
        return f"{seconds * 1e3:.1f}ms"
    if seconds < 60:
        return f"{seconds:.3f}s"
    minutes, secs = divmod(seconds, 60)
    return f"{int(minutes)}m{secs:04.1f}s"


@contextmanager
def track_time(store: Optional[List[float]] = None, verbose: bool = False,
               model: str = "", label: str = "training"):
    """Context manager appending elapsed seconds to ``store``.

    Any JAX arrays produced inside should be waited on by the caller (or use
    :func:`timed_blocked` around a single computation).
    """
    start = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - start
        if store is not None:
            store.append(elapsed)
        if verbose:
            name = f"{model} " if model else ""
            print(f"{name}{label} time: {format_elapsed_time(elapsed)}")


def timed_blocked(fn, *args, **kwargs):
    """Run ``fn`` and block on its outputs; return ``(result, seconds)``."""
    start = time.perf_counter()
    result = fn(*args, **kwargs)
    result = jax.block_until_ready(result)
    return result, time.perf_counter() - start


@contextmanager
def profiler_trace(logdir: Optional[str] = None):
    """Optionally wrap a block in a ``jax.profiler`` trace."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def enable_compilation_cache(cache_dir: str = "~/.cache/polara_tpu_xla"
                             ) -> None:
    """Persist XLA executables across processes — the first jit of the
    big scoring/factorization programs costs tens of seconds on TPU;
    subsequent runs of the same shapes load from disk instead."""
    import os

    import jax
    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
