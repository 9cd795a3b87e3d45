"""Smoke tests for the example demos (VERDICT r4 item 6).

Each ``examples/*.py`` exposes ``main(smoke=True, outdir=...)`` which
shrinks every size so the full demo logic — fan tracing, eigenray
finding, AD, ensembles, plotting, and each demo's own physics asserts —
runs in seconds on the CPU test backend.  A broken demo fails the suite
instead of rotting silently.
"""

import importlib.util
import pathlib
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).parent.parent / "examples"

DEMOS = [
    "amplitude_demo",
    "impulse_response_demo",
    "timefront_demo",
    "sensitivity_kernel_demo",
    "monte_carlo_demo",
    "inversion_demo",
    "gradient_inversion_demo",
    "localization_demo",
    "rough_field_sensitivity_demo",
    "tl_demo",
]


def _load(name):
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", DEMOS)
def test_demo_smoke(name, tmp_path):
    mod = _load(name)
    mod.main(smoke=True, outdir=tmp_path)
    # every demo writes at least one figure
    assert list(tmp_path.glob("*.png")), f"{name} wrote no figure"
