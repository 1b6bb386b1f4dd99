"""Native (C++/OpenMP) host-side kernels, auto-built on first import.

``from depthestimation_tpu.native import kittiops`` raises ImportError when
no compiler is available; callers fall back to the numpy backend.
"""
