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
