"""sweep_convert CLI: synthesize a raw capture (sweep npy + lidar bin +
images + calib.json) and convert it end-to-end (the reference's
sweep_convert.py dataset-builder role)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

W, H = 96, 64            # left image at the 1/4 processing scale
LC_W, LC_H = 256, 320    # converter's fixed LC processing size


def _make_capture(root):
    drive = "2024_01_01_drive_0001_sweep"
    base = os.path.join(root, "2024_01_01", drive)
    for sub in ("sweep", "left_img", "right_img", "nir_img", "lidar"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    rng = np.random.default_rng(0)
    f = 0.8 * LC_W
    k_lc = [[f, 0, LC_W / 2], [0, f, LC_H / 2], [0, 0, 1]]

    # sweep tensor: 128 planes at half the stored LC resolution is fine;
    # the converter undistorts + projects whatever resolution is stored
    zs = np.linspace(3, 18, 128, dtype=np.float32)
    sweep = np.zeros((128, LC_H, LC_W, 2), np.float32)
    sweep[..., 0] = zs[:, None, None]
    sweep[..., 1] = rng.uniform(0, 255, (128, LC_H, LC_W)).astype(np.float32)

    # velodyne: a wall of points at z ~ 10 m in front of the left camera
    n = 20000
    pts = np.ones((n, 4), np.float32)
    pts[:, 0] = rng.uniform(-8, 8, n)
    pts[:, 1] = rng.uniform(-3, 3, n)
    pts[:, 2] = rng.uniform(8, 12, n)

    idx = "000000"
    np.save(os.path.join(base, "sweep", idx + ".npy"), sweep)
    pts.tofile(os.path.join(base, "lidar", idx + ".bin"))
    # stored images are 4x the processing scale (converter resizes by 1/4)
    img = rng.integers(0, 255, (H * 4, W * 4, 3), np.uint8)
    cv2.imwrite(os.path.join(base, "left_img", idx + ".png"), img)
    cv2.imwrite(os.path.join(base, "right_img", idx + ".png"), img)
    nir = rng.integers(0, 255, (LC_H * 2, LC_W * 2), np.uint8)
    cv2.imwrite(os.path.join(base, "nir_img", idx + ".png"),
                cv2.cvtColor(nir, cv2.COLOR_GRAY2BGR))

    fl = 0.8 * W * 4
    left_p = [[fl, 0, W * 2, 0], [0, fl, H * 2, 0], [0, 0, 1, 0]]
    calib = {
        "left_P": left_p,
        "left_2_lidar": np.eye(4).tolist(),
        "left_2_right": [[1, 0, 0, -0.5], [0, 1, 0, 0], [0, 0, 1, 0],
                         [0, 0, 0, 1]],
        "left_2_lc": [[1, 0, 0, 0.1], [0, 1, 0, 0], [0, 0, 1, 0.05],
                      [0, 0, 0, 1]],
        "K_lc": k_lc,
        "D_lc": [0.0] * 5,
    }
    json.dump(calib, open(os.path.join(base, "calib.json"), "w"))
    return drive


@pytest.mark.slow
def test_sweep_convert_end_to_end(tmp_path):
    drive = _make_capture(str(tmp_path))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "sweep_convert.py"),
         "--root", str(tmp_path), "--drive", drive, "--frames", "0:1"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr

    out = np.load(os.path.join(str(tmp_path), "2024_01_01", drive,
                               "converted", "000000.npz"))
    assert out["left_feat_int"].shape == (128, H, W)
    assert out["left_feat_z"].shape == (128, H, W)
    assert out["left_depth"].shape == (H, W)
    # the velodyne wall must land in the depth map around 8-12 m
    d = out["left_depth"]
    assert (d > 0).mean() > 0.2
    assert 8.0 <= np.median(d[d > 0]) <= 12.5
    # sweep features must be sampled where depth is valid
    assert np.isfinite(out["left_feat_int"]).any()
    assert out["left_mask"].max() == 1.0
