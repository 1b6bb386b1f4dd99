"""Pure-JAX core ops: DPV math, geometry, resampling, plane-sweep, metrics."""

from depthestimation_tpu.ops.dpv import (  # noqa: F401
    EPS,
    powerf,
    gaussian,
    gen_soft_label,
    gen_uniform,
    dpv_to_depthmap,
    upsample_dpv,
    spread_dpv,
    gen_dpv_withmask,
    lc_intensities_to_dist,
    mixed_model,
    intensity_to_confidence,
    invert_curve,
)
from depthestimation_tpu.ops.geometry import (  # noqa: F401
    pixel_to_ray_array,
    unit_ray_array_2d,
    depth_to_pts,
    intr_scale,
    intr_scale_unit,
    minpool,
    pixel2cam,
    cam2pixel,
    inverse_warp,
    transform_dmap,
)
from depthestimation_tpu.ops.resample import (  # noqa: F401
    grid_sample,
    resize_bilinear_align_corners,
    shift_rows,
)
from depthestimation_tpu.ops.plane_sweep import (  # noqa: F401
    plane_sweep_and_warp,
    plane_sweep_and_warp_decomposed,
    plane_sweep_volume,
    plane_sweep_volume_decomposed,
    warp_feature_volume,
)
from depthestimation_tpu.ops.ufield import (  # noqa: F401
    gen_ufield,
    compute_unc_field,
    compute_unc_rmse,
)
from depthestimation_tpu.ops.metrics import depth_error, eval_errors  # noqa: F401
