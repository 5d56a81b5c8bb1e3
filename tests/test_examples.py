"""Smoke tests for the four demo scripts in examples/: each runs end-to-end
as a subprocess under PVT_EXAMPLE_SMOKE=1 (tiny sizes, same code paths), so
the examples cannot silently rot."""

import os
import subprocess
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


@pytest.mark.parametrize("script", ["trajectory_optimization.py",
                                    "pose_estimation.py",
                                    "neural_distillation.py",
                                    "serving_export.py"])
def test_example_runs(script):
    env = dict(os.environ)
    env["PVT_EXAMPLE_SMOKE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    # run without the conftest's 8-device split: examples are single-device
    p = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         f"import runpy; runpy.run_path(r'{os.path.join(EXAMPLES_DIR, script)}',"
         "run_name='__main__')"],
        capture_output=True, text=True, timeout=600, env=env)
    assert p.returncode == 0, f"{script} failed:\n{p.stdout}\n{p.stderr}"
