#!/usr/bin/env python3
"""sweep_convert: build the training-ready sweep dataset from raw captures.

Headless CLI equivalent of the reference's sweep_convert.py (674 LoC
interactive tool, /root/reference/sweep_convert.py:34-190): for every frame
of a raw sweep capture

  <root>/<date>/<drive>/{sweep/*.npy, left_img/*.png, right_img/*.png,
                         nir_img/*.png, lidar/*.bin, calib.json}

it (1) undistorts the 128-plane sweep tensor and NIR image with the LC
camera's distortion model, (2) projects the velodyne cloud into left/right/
LC depth maps with occlusion filtering + hole filling, (3) warps the sweep
planes into both RGB frames (``lcsweep_to_rgbsweep``), and (4) writes one
``converted/<index>.npz`` per frame with the tensors the sweep trainer
consumes (feat_int/feat_z/masks/nir_warped per side + depths). A
``--panel`` option renders a UF-debug PNG per frame (the headless stand-in
for the reference's interactive viewer).

Run:  python tools/sweep_convert.py --root /data/sweep_data \
          --drive 2021_03_05_drive_0004_sweep [--frames 0:100] [--panel]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Host-side data-prep tool: run on CPU unless the caller explicitly picks a
# platform. Without this the ambient TPU plugin grabs the accelerator at
# import time (and silently ignores a JAX_PLATFORMS env var — see
# utils/compile_cache.honor_jax_platforms_env).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from depthestimation_tpu.utils.compile_cache import honor_jax_platforms_env

from depthestimation_tpu.data import velodyne
from depthestimation_tpu.data.ilim import lcsweep_to_rgbsweep

honor_jax_platforms_env()

# the LC camera intrinsics/distortion of the capture rig
# (sweep_convert.py:68-75); calib.json can override via "K_lc"/"D_lc"
DEFAULT_K_LC = np.array([[893.074542 / 4, 0, 524.145998 / 4],
                         [0, 893.177518 / 4, 646.766885 / 4],
                         [0, 0, 1]], np.float32)
DEFAULT_D_LC = np.array([-0.033918, 0.027494, -0.001691, -0.001078, 0.0],
                        np.float32)
LC_SIZE = (256, 320)   # (w, h) at the processing scale


def undistort(img, K, D):
    import cv2
    return cv2.undistort(np.asarray(img, np.float32), K, D)


def load_frame(root, drive, idx):
    import cv2
    date = drive.split("_drive")[0]
    base = os.path.join(root, date, drive)
    s = f"{idx:06d}"
    frame = {}
    frame["sweep_arr"] = np.load(os.path.join(base, "sweep", s + ".npy")) \
        .astype(np.float32)                         # [128, Hlc, Wlc, 2]
    frame["velodata"] = np.fromfile(os.path.join(base, "lidar", s + ".bin"),
                                    dtype=np.float32).reshape(-1, 4)
    left = cv2.imread(os.path.join(base, "left_img", s + ".png"))
    right = cv2.imread(os.path.join(base, "right_img", s + ".png"))
    nir = cv2.imread(os.path.join(base, "nir_img", s + ".png"))
    frame["left_img"] = cv2.resize(left, None, fx=0.25, fy=0.25,
                                   interpolation=cv2.INTER_AREA)
    frame["right_img"] = cv2.resize(right, None, fx=0.25, fy=0.25,
                                    interpolation=cv2.INTER_AREA)
    nir = cv2.cvtColor(nir, cv2.COLOR_BGR2GRAY)
    frame["nir_img"] = cv2.resize(nir, None, fx=0.5, fy=0.5,
                                  interpolation=cv2.INTER_AREA)

    with open(os.path.join(base, "calib.json")) as f:
        calib = json.load(f)
    intr = np.array(calib["left_P"], np.float32) / 4.0
    intr[2, 2] = 1.0
    frame["large_intr"] = intr[:3, :3]
    frame["M_velo2left"] = np.linalg.inv(
        np.array(calib["left_2_lidar"], np.float32))
    frame["M_left2right"] = np.array(calib["left_2_right"], np.float32)
    frame["M_left2LC"] = np.array(calib["left_2_lc"], np.float32)
    frame["M_right2LC"] = (np.linalg.inv(frame["M_left2right"])
                           @ frame["M_left2LC"])
    frame["M_velo2right"] = frame["M_left2right"] @ frame["M_velo2left"]
    frame["M_velo2LC"] = frame["M_left2LC"] @ frame["M_velo2left"]
    frame["K_lc"] = np.array(calib.get("K_lc", DEFAULT_K_LC), np.float32)
    frame["D_lc"] = np.array(calib.get("D_lc", DEFAULT_D_LC), np.float32)
    return frame


def convert_frame(frame, lc_size=LC_SIZE):
    """Raw frame dict -> converted tensors (both camera sides)."""
    # 1. undistort sweep planes + NIR in the LC frame (sweep_convert:110-115)
    K, D = frame["K_lc"], frame["D_lc"]
    sweep = frame["sweep_arr"]
    und = np.empty_like(sweep)
    for i in range(sweep.shape[0]):
        und[i, :, :, 0] = undistort(sweep[i, :, :, 0], K, D)
        und[i, :, :, 1] = undistort(sweep[i, :, :, 1], K, D)
    nir = undistort(frame["nir_img"], K, D)

    # 2. velodyne -> depth maps with occlusion filtering + hole filling
    h, w = frame["left_img"].shape[:2]
    params = {"filtering": 2, "upsample": 0}
    intr34 = np.concatenate([frame["large_intr"],
                             np.zeros((3, 1), np.float32)], 1)
    k_lc34 = np.concatenate([K, np.zeros((3, 1), np.float32)], 1)
    left_depth = velodyne.generate_depth(frame["velodata"], intr34,
                                         frame["M_velo2left"], w, h, params)
    right_depth = velodyne.generate_depth(frame["velodata"], intr34,
                                          frame["M_velo2right"], w, h, params)
    lc_depth = velodyne.generate_depth(frame["velodata"], k_lc34,
                                       frame["M_velo2LC"], lc_size[0],
                                       lc_size[1], params)
    left_depth = velodyne.upsample_depth(left_depth, 2, 0.5)
    right_depth = velodyne.upsample_depth(right_depth, 2, 0.5)
    lc_depth = velodyne.upsample_depth(lc_depth, 2, 0.5)

    # 3. project the sweep into both RGB frames
    out = {"left_depth": left_depth, "right_depth": right_depth,
           "lc_depth": lc_depth, "nir_img": nir,
           "sweep_arr": und.astype(np.float32)}
    for side, m in (("left", frame["M_left2LC"]),
                    ("right", frame["M_right2LC"])):
        dmap = left_depth if side == "left" else right_depth
        fi, fz, mask, train_mask, nir_t = lcsweep_to_rgbsweep(
            und, dmap, frame["large_intr"], (w, h), K, lc_size, m,
            nir_img=nir if side == "left" else None)
        out[f"{side}_feat_int"] = fi.astype(np.float32)
        out[f"{side}_feat_z"] = fz.astype(np.float32)
        out[f"{side}_mask"] = mask.astype(np.float32)
        out[f"{side}_train_mask"] = train_mask.astype(np.float32)
        if side == "left":
            out["nir_warped"] = nir_t.astype(np.float32)
    return out


def render_panel(out, path):
    """UF debug panel (headless stand-in for the reference's cv2 windows)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(10, 7))
    axes[0, 0].imshow(out["left_depth"], cmap="turbo")
    axes[0, 0].set_title("left depth")
    axes[0, 1].imshow(out["lc_depth"], cmap="turbo")
    axes[0, 1].set_title("LC depth")
    peak = np.nanmax(out["left_feat_int"], axis=0)
    axes[1, 0].imshow(peak, cmap="gray")
    axes[1, 0].set_title("sweep peak intensity (left frame)")
    axes[1, 1].imshow(out["nir_warped"][0], cmap="gray")
    axes[1, 1].set_title("warped NIR")
    for ax in axes.flat:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--drive", required=True)
    ap.add_argument("--frames", default=None,
                    help="start:end frame range (default: all found)")
    ap.add_argument("--out", default=None,
                    help="output dir (default <drive>/converted)")
    ap.add_argument("--panel", action="store_true")
    args = ap.parse_args()

    date = args.drive.split("_drive")[0]
    base = os.path.join(args.root, date, args.drive)
    sweep_dir = os.path.join(base, "sweep")
    indices = sorted(int(f.split(".")[0]) for f in os.listdir(sweep_dir)
                     if f.endswith(".npy"))
    if args.frames:
        lo, hi = (int(x) for x in args.frames.split(":"))
        indices = [i for i in indices if lo <= i < hi]

    out_dir = args.out or os.path.join(base, "converted")
    os.makedirs(out_dir, exist_ok=True)
    for idx in indices:
        frame = load_frame(args.root, args.drive, idx)
        out = convert_frame(frame)
        np.savez_compressed(os.path.join(out_dir, f"{idx:06d}.npz"), **out)
        if args.panel:
            render_panel(out, os.path.join(out_dir, f"{idx:06d}.png"))
        print(f"converted frame {idx} -> {out_dir}/{idx:06d}.npz")
    print(f"done: {len(indices)} frames")


if __name__ == "__main__":
    main()
