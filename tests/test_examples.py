"""Smoke-run every example script (the reference validates pipelines via
executable notebooks, SURVEY §4 — these scripts are our equivalent, so
they must stay runnable)."""
import importlib.util
import io
import pathlib
import sys
from contextlib import redirect_stdout

import pytest

EXAMPLES_DIR = pathlib.Path(__file__).resolve().parent.parent / "examples"
EXAMPLES = sorted(p.stem for p in EXAMPLES_DIR.glob("*.py"))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"example_{name}", EXAMPLES_DIR / f"{name}.py")
    module = importlib.util.module_from_spec(spec)
    # examples are standalone scripts; register so dataclasses etc. work
    sys.modules[spec.name] = module
    try:
        spec.loader.exec_module(module)
    finally:
        sys.modules.pop(spec.name, None)
    return module


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    module = _load(name)
    buf = io.StringIO()
    with redirect_stdout(buf):
        module.main()
    assert buf.getvalue().strip(), f"{name} produced no output"
