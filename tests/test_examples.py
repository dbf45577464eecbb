"""Example smoke tests: every shipped example must run end-to-end.

The reference's examples double as tests (SURVEY §4 tier 3,
``example_nd_dwt_{1..4}D.m`` print round-trip invariants); here they are CI
citizens so they cannot rot.
"""

import importlib.util
import os
import sys

import pytest

_EX_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_EX_DIR, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize(
    "name",
    [
        "example_nd_dwt_1D",
        "example_nd_dwt_2D",
        "example_nd_dwt_3D",
        "example_nd_dwt_4D",
        "example_multicoil",
        "example_iterative_shrinkage",
        "example_split_complex_fista",
        "example_any_shape",
    ],
)
def test_example_runs(name, capsys):
    mod = _load(name)
    mod.main()
    out = capsys.readouterr().out
    assert "bands" in out
