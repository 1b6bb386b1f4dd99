"""Light-curtain subsystem tests: device physics, planner constraints,
field warps, and Bayes-loop convergence (the ros/plots.py behaviour)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu import ops
from depthestimation_tpu.lc import LCDevice, LightCurtain, PlannerRT
from depthestimation_tpu.lc.fieldwarp import digitize_soft
from depthestimation_tpu.lc.process import lc_process
from depthestimation_tpu.ops.ufield import UFieldParams

W, H = 64, 48


def _device(w=W, h=H):
    intr = np.array([[0.8 * w, 0, w / 2], [0, 0.8 * w, h / 2], [0, 0, 1]],
                    np.float32)
    cam = {"width": w, "height": h, "matrix": intr,
           "distortion": [0.0] * 5, "hit_mode": 1, "hit_noise": 0.0}
    ltc = np.eye(4, dtype=np.float32)
    ltc[0, 3] = 0.2
    laser = {"lTc": ltc, "fov": 80.0, "laser_timestep": 2e-4}
    return LCDevice(cam, laser)


def _flat_curtain(z, n=200):
    xs = np.linspace(-8, 8, n).astype(np.float32)
    return np.stack([xs, np.full_like(xs, z)], -1)


def test_device_flat_curtain_intensity():
    dev = _device()
    depth = np.full((H, W), 10.0, np.float32)
    out, thick = dev.get_return(depth, _flat_curtain(10.0), True)
    out = np.asarray(out)
    # curtain exactly on the surface -> full return
    assert np.nanmin(out[:, :, 3]) > 250.0
    np.testing.assert_allclose(out[:, :, 2], 10.0, atol=1e-4)
    assert np.all(np.asarray(thick) > 0)

    # curtain far from the surface -> no return
    out2, _ = dev.get_return(depth, _flat_curtain(20.0), True)
    assert np.nanmax(np.asarray(out2)[:, :, 3]) < 1.0


def test_device_thickness_grows_with_range():
    dev = _device()
    t_near = np.asarray(dev.curtain_thickness(jnp.asarray(_flat_curtain(5.0))))
    t_far = np.asarray(dev.curtain_thickness(jnp.asarray(_flat_curtain(30.0))))
    assert np.nanmedian(t_far) > np.nanmedian(t_near)


def test_planner_prefers_high_cost_and_respects_galvo():
    dev = _device()
    ranges = ops.powerf(3.0, 30.0, 32, 1.0)
    planner = PlannerRT(dev, ranges, W)
    # cost concentrated at range bin 10
    field = np.zeros((32, W), np.float32)
    field[10, :] = 1.0
    pts = np.asarray(planner.get_design_points(field))
    assert pts.shape == (W, 2)
    z_expect = ranges[10] * np.cos(np.radians(dev.thetas))
    np.testing.assert_allclose(pts[:, 1], z_expect, rtol=0.02)

    # random field: solution must satisfy the galvo velocity limit
    rng = np.random.default_rng(0)
    field = rng.random((32, W)).astype(np.float32)
    pts = np.asarray(planner.get_design_points(field))
    phi = np.degrees(np.arctan2(pts[:, 0] + 0.2 * 0, pts[:, 1]))  # approx
    xl = pts[:, 0] + dev.lTc[0, 3]
    phi = np.degrees(np.arctan2(xl, pts[:, 1]))
    dphi = np.abs(np.diff(phi))
    assert dphi.max() <= planner.dphi_max + 1e-3


def test_planner_acceleration_constraint():
    """With a finite galvo acceleration limit (max_alpha) the DP runs the
    (ray, range_prev, range) graph: velocity may change by at most
    max_alpha*dt^2 per ray — the full physics of the reference PlannerRT
    (SURVEY §2.5). Sensitivity pin: the accel-limited path is strictly
    smoother on an adversarial (alternating) cost field, and degrades
    gracefully (still finds the high-cost band on an easy field)."""
    intr = np.array([[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]],
                    np.float32)
    cam = {"width": W, "height": H, "matrix": intr,
           "distortion": [0.0] * 5, "hit_mode": 1, "hit_noise": 0.0}
    ltc = np.eye(4, dtype=np.float32)
    ltc[0, 3] = 0.2
    dt = 2e-4
    laser = {"lTc": ltc, "fov": 80.0, "laser_timestep": dt}
    # velocity budget ~ full range; acceleration budget deliberately tight
    dev_v = LCDevice(cam, dict(laser))
    # velocity may change by at most 1/4 of its full range per ray
    dev_a = LCDevice(cam, dict(laser, max_alpha=0.25 * dev_v.max_omega / dt))
    assert dev_a.max_alpha is not None
    ranges = ops.powerf(3.0, 30.0, 24, 1.0)
    pl_v = PlannerRT(dev_v, ranges, W)
    pl_a = PlannerRT(dev_a, ranges, W)
    assert pl_a.ddphi_max is not None and pl_v.ddphi_max is None

    def phi_of(pts):
        return np.degrees(np.arctan2(pts[:, 0] + ltc[0, 3], pts[:, 1]))

    # adversarial alternating field tempts the planner into zig-zags
    field = np.zeros((24, W), np.float32)
    field[4, ::2] = 1.0
    field[20, 1::2] = 1.0
    pts_v = np.asarray(pl_v.get_design_points(field))
    pts_a = np.asarray(pl_a.get_design_points(field))
    dphi_a = np.diff(phi_of(pts_a))
    # both limits hold on the accel-constrained path
    assert np.abs(dphi_a).max() <= pl_a.dphi_max + 1e-3
    assert np.abs(np.diff(dphi_a)).max() <= pl_a.ddphi_max + 1e-3
    # and it is strictly smoother than the velocity-only plan
    assert (np.abs(np.diff(phi_of(pts_a), 2)).max()
            <= np.abs(np.diff(phi_of(pts_v), 2)).max() + 1e-6)

    # graceful degradation: single high-cost band is still found
    easy = np.zeros((24, W), np.float32)
    easy[10, :] = 1.0
    pts = np.asarray(pl_a.get_design_points(easy))
    z_expect = ranges[10] * np.cos(np.radians(dev_a.thetas))
    np.testing.assert_allclose(pts[:, 1], z_expect, rtol=0.05)


def test_digitize_soft_matches_reference_semantics():
    arr = np.array([1.0, 2.0, 4.0, 8.0])
    assert digitize_soft(1.0, arr) == 0
    assert digitize_soft(8.0, arr) == pytest.approx(3.0)
    assert digitize_soft(3.0, arr) == pytest.approx(1.5)
    assert digitize_soft(0.5, arr) < -1e6
    assert digitize_soft(9.0, arr) > 1e6


def _make_lc(d=16, d_up=32):
    lc = LightCurtain()
    intr = np.array([[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]],
                    np.float32)
    params = {
        "intr_rgb": intr, "dist_rgb": [0.0] * 5, "size_rgb": [W, H],
        "intr_lc": intr, "dist_lc": [0.0] * 5, "size_lc": [W, H],
        "rTc": np.eye(4, dtype=np.float32),
        "lTc": np.array([[1, 0, 0, 0.2], [0, 1, 0, 0], [0, 0, 1, 0],
                         [0, 0, 0, 1]], np.float32),
        "laser_fov": 80.0, "laser_timestep": 2e-4,
        "d_candi": ops.powerf(3.0, 30.0, d, 1.0),
        "r_candi": ops.powerf(3.0, 30.0, d, 1.0),
        "d_candi_up": ops.powerf(3.0, 30.0, d_up, 1.0),
        "r_candi_up": ops.powerf(3.0, 30.0, d_up, 1.0),
        "expand_A": d, "expand_B": d_up, "name": "test",
    }
    lc.init(params)
    return lc


def test_plan_default_shapes():
    lc = _make_lc()
    field = jnp.asarray(np.random.default_rng(1).random((16, W)), jnp.float32)
    paths = lc.plan_default_high(field, {"step": [0.25, 0.75]})
    assert paths.shape == (5, W, 2)
    z = np.asarray(paths[:, :, 1])
    assert z.min() > 2.0 and z.max() < 31.0


def test_sense_high_dpv_peaks_at_curtain():
    lc = _make_lc()
    depth = np.full((H, W), 12.0, np.float32)
    dpv = np.asarray(lc.sense_high(depth, jnp.asarray(_flat_curtain(12.0))))
    assert dpv.shape == (16, H, W)
    np.testing.assert_allclose(dpv.sum(0), 1.0, atol=1e-4)
    d_candi = np.asarray(lc.d_candi)
    peak = d_candi[dpv[:, H // 2, W // 2].argmax()]
    assert abs(peak - 12.0) < 2.5


def test_lc_process_converges_toward_truth():
    """The headline behaviour: iterating plan->sense->fuse sharpens the DPV
    around the true depth (UF-RMSE convergence, reference ros/plots.py).
    A weak prior 5 m off the truth must tighten to sub-meter error.

    Four rounds: the physically-correct intensity falloff (sigma ~ t/4,
    lc/device.py) makes each sheet thinner, so walking the belief in from
    5 m off takes ~4 plan->sense->fuse rounds (0.62 m at 4; 2.0 m at 2)."""
    lc = _make_lc(d=32, d_up=64)
    d_candi = np.asarray(lc.d_candi)
    depth_gt = np.full((H, W), 15.0, np.float32)
    intr = np.asarray(lc.PARAMS["intr_rgb"], np.float32)

    soft = np.asarray(ops.gen_soft_label(
        d_candi, np.full((H, W), 20.0, np.float32), 25.0))
    prior = np.log(np.clip(soft, 1e-16, 1))[None]
    ufp = UFieldParams(pshift=0, zstart=-1e6, zend=1e6, maxd=1e6, mind=0.0,
                       quash=False)
    fused = lc_process(jnp.asarray(prior), jnp.asarray(depth_gt)[None],
                       jnp.asarray(intr)[None], lc, ufp, iterations=4,
                       planner="default",
                       params={"step": [0.25, 0.5, 0.75], "spread_iter": 1,
                               "spread_n": 3},
                       key=jax.random.PRNGKey(0))
    dm = np.asarray(ops.dpv_to_depthmap(fused, d_candi, log=True))[0]
    err_fused = np.abs(dm - 15.0).mean()
    dm0 = np.asarray(ops.dpv_to_depthmap(jnp.asarray(prior), d_candi,
                                         log=True))[0]
    err_prior = np.abs(dm0 - 15.0).mean()
    assert err_prior > 4.0
    assert err_fused < 1.0, (err_fused, err_prior)
