"""Light-curtain subsystem: simulator, planner, field warps, Bayes loop.

TPU-native rebuild of the reference's ``lc/`` + the (absent) ``lcsim``
submodule: the curtain device model and the galvo-constrained planner are
pure JAX (device-resident, differentiable, batchable) instead of C++
pybind calls — the whole plan->sense->fuse recursion jits into one XLA
program (see ``process.py``).
"""

from depthestimation_tpu.lc.device import LCDevice  # noqa: F401
from depthestimation_tpu.lc.planner import PlannerRT  # noqa: F401
from depthestimation_tpu.lc.curtain import LightCurtain  # noqa: F401
