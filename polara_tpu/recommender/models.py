"""Alias of :mod:`polara_tpu.models` matching the reference import path."""
from polara_tpu.models import *                    # noqa: F401,F403
from polara_tpu.models import __all__              # noqa: F401
from polara_tpu.models.baselines import NonPersonalized  # noqa: F401
