"""
Smoke-run every example end-to-end on tiny shapes (``BILD_SMOKE=1``).

The examples are user-facing documentation; an example that crashes is a
docs bug (VERDICT r2 #9: examples were never executed by any test). Run
in-process (subprocesses would re-pay jax import + thread contention on
1-core CI hosts) with the smoke env var shrinking every workload.
"""
import importlib
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")

# ~3 min on the 1-core CI host (virtual 8-device mesh): slow lane
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _smoke_env(monkeypatch):
    monkeypatch.setenv("BILD_SMOKE", "1")
    monkeypatch.syspath_prepend(EXAMPLES_DIR)


def _run(name):
    mod = importlib.import_module(name)
    # examples read the env at main() time, so a cached import is fine
    mod.main()


def test_single_trajectory(capsys):
    _run("single_trajectory")
    out = capsys.readouterr().out
    assert "best k:" in out
    assert "frame accuracy:" in out


def test_infer_dataset(capsys):
    _run("infer_dataset")
    out = capsys.readouterr().out
    assert "k histogram" in out


def test_ggm_model(capsys):
    _run("ggm_model")
    out = capsys.readouterr().out
    assert "dataset: mean frame accuracy" in out


def test_calibrate_params(capsys):
    _run("calibrate_params")
    out = capsys.readouterr().out
    assert "frame accuracy with calibrated model:" in out
