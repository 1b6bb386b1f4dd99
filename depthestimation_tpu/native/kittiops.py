"""ctypes bindings for kittiops.cpp (built lazily with g++)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "kittiops.cpp")
_SO = os.path.join(_DIR, "libkittiops.so")


def _build():
    if (os.path.isfile(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


_build()
_lib = ctypes.CDLL(_SO)

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_lib.generate_depth.argtypes = [_f32p, ctypes.c_int64, _f32p, _f32p,
                                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                ctypes.c_float, _f32p]
_lib.upsample_depth.argtypes = [_f32p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_float, _f32p]
_lib.upsample_velodyne.argtypes = [_f32p, ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_float, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_float,
                                   ctypes.c_float, _f32p]
_lib.lc_generate.argtypes = [_f32p, ctypes.c_int64, _f32p, _f32p,
                             ctypes.c_int, ctypes.c_int, ctypes.c_int,
                             _f32p, _f32p, _f32p, _f32p, _f32p]


def generate_depth(velodata, intr, m_velo2cam, width, height, filtering,
                   filterdiff):
    velodata = np.ascontiguousarray(velodata, np.float32)
    out = np.zeros((height, width), np.float32)
    _lib.generate_depth(velodata, velodata.shape[0],
                        np.ascontiguousarray(intr, np.float32),
                        np.ascontiguousarray(m_velo2cam, np.float32),
                        width, height, filtering, filterdiff, out)
    return out


def upsample_depth(depth, filtering, maxdiff):
    depth = np.ascontiguousarray(depth, np.float32)
    out = np.zeros_like(depth)
    _lib.upsample_depth(depth, depth.shape[0], depth.shape[1], filtering,
                        maxdiff, out)
    return out


def upsample_velodyne(pts_cam, scale, total_vbeams, total_hbeams, vbeam_fov,
                      hbeam_fov):
    pts_cam = np.ascontiguousarray(pts_cam, np.float32)
    vb2, hb2 = int(total_vbeams * scale), int(total_hbeams * scale)
    out = np.empty((vb2 * hb2, 4), np.float32)
    _lib.upsample_velodyne(pts_cam, pts_cam.shape[0], pts_cam.shape[1],
                           float(scale), int(total_vbeams), int(total_hbeams),
                           float(vbeam_fov), float(hbeam_fov), out)
    return out


def lc_generate(proj_points, sweep_int, sweep_z, lc_width, lc_height,
                nir_img):
    proj_points = np.ascontiguousarray(proj_points, np.float32)
    sweep_int = np.ascontiguousarray(sweep_int, np.float32)
    sweep_z = np.ascontiguousarray(sweep_z, np.float32)
    n = proj_points.shape[0]
    planes = sweep_int.shape[0]
    feat_int = np.empty((planes, n), np.float32)
    feat_z = np.empty((planes, n), np.float32)
    mask = np.empty((1, n), np.float32)
    nir = np.empty((1, n), np.float32)
    _lib.lc_generate(proj_points, n, sweep_int.reshape(planes, -1),
                     sweep_z.reshape(planes, -1), planes, int(lc_width),
                     int(lc_height),
                     np.ascontiguousarray(nir_img, np.float32).reshape(-1),
                     feat_int, feat_z, mask[0], nir[0])
    return feat_int, feat_z, mask, nir
