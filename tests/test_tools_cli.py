"""Smoke tests: every CLI tool parses --help (imports resolve)."""

import os
import subprocess
import sys

import pytest

TOOLS = [
    "tools/train_net.py",
    "tools/demo.py",
    "tools/generate_pseudo_labels.py",
    "tools/visualize_data.py",
    "tools/export_inference.py",
    "tools/convert_torchvision_weights.py",
    "tools/bench_train.py",
    "tools/bench_dataloader.py",
    "tools/profile_inference.py",
    "datasets/prepare_cityscapes.py",
    "datasets/prepare_kitti_eigen.py",
]


@pytest.mark.parametrize("tool", TOOLS)
def test_help(tool):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, tool, "--help"],
        capture_output=True, timeout=120, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
