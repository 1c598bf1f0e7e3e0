"""Alias of :mod:`polara_tpu.data` matching the reference import path."""
from polara_tpu.data import *                      # noqa: F401,F403
from polara_tpu.data import __all__                # noqa: F401
from polara_tpu.data.dataset import TestData       # noqa: F401
