"""Equal-weights forward parity vs the torch reference formulation (the
north-star "depth RMSE within 1%" pin, BASELINE.md). Small dims; the full
KITTI-dims run lives in benchmarks/parity_forward.py."""

import subprocess
import sys
import os
import json
import pytest


@pytest.mark.slow
def test_forward_parity_small():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable,
                        os.path.join(root, "benchmarks", "parity_forward.py")],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    rep = json.load(open(os.path.join(root, "benchmarks",
                                      "parity_forward.json")))
    assert rep["depth_rmse_rel_diff_pct"] < 1.0
    assert rep["depth_map_rmse_between_stacks_m"] < 1e-3
    assert rep["refined_max_abs_diff"] < 0.05
