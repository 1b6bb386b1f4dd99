"""Coverage for the remaining nmode branches (exp2/exp3/lc), the stereo
input assembly, and the diffhomo=False path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu.config import config_from_dict
from depthestimation_tpu.data import synthetic
from depthestimation_tpu.data.scheduler import BatchScheduler
from depthestimation_tpu.data.video_synthetic import (
    SyntheticStereoVideoDataset,
    assemble_inputs,
)
from depthestimation_tpu.models import get_model
from depthestimation_tpu.ops import dpv as dpv_ops
from tests.test_models import BASE_CFG, _inputs


def _make(nmode, **var):
    cfg = config_from_dict(BASE_CFG)
    cfg.var.nmode = nmode
    for k, v in var.items():
        cfg.var[k] = v
    return cfg, get_model(cfg)


def _fwd(model, mi):
    rngs = {"params": jax.random.PRNGKey(0), "lc_drop": jax.random.PRNGKey(1)}
    variables = model.init(rngs, mi, train=False)
    return model.apply(variables, mi, train=False,
                       rngs={"lc_drop": jax.random.PRNGKey(2)})


def test_nmode_exp2_fuses_gt_dpv():
    cfg, model = _make("exp2")
    mi, _ = _inputs()
    tofuse = np.asarray(dpv_ops.gen_dpv_withmask(
        mi["dmaps"], mi["masks"], mi["d_candi"], 0.3))
    mi = dict(mi)
    mi["tofuse_dpv"] = jnp.asarray(tofuse)
    out = _fwd(model, mi)
    assert out["output"][0].shape == (2, 32, 16, 24)   # fused first
    assert len(out["output"]) == 2
    p = np.asarray(jnp.exp(out["output"][0]).sum(1))
    np.testing.assert_allclose(p, 1.0, atol=1e-3)


def test_nmode_exp3():
    cfg, model = _make("exp3")
    mi, _ = _inputs()
    out = _fwd(model, mi)
    assert out["output"][-1].shape == (2, 32, 16, 24)
    assert out["output_refined"][-1].shape == (2, 32, 64, 96)


def test_nmode_lc_no_homography():
    cfg, model = _make("lc", diffhomo=False)
    mi, _ = _inputs()
    out = _fwd(model, mi)
    assert out["output"][-1].shape == (2, 32, 16, 24)
    assert np.isfinite(np.asarray(out["output_refined"][-1])).all()


def test_stereo_input_assembly():
    ds = SyntheticStereoVideoDataset(n_traj=2, traj_len=2, h=64, w=96,
                                     ndepth=32)
    sched = BatchScheduler(ds, 2, shuffle=False, prefetch=False)
    batch = next(iter(sched.enumerate()))
    mi, gt = assemble_inputs(batch, "left", stereo=True)
    # stereo: rgb = [other side, this side], poses = [T_l2r, I]
    assert mi["rgb"].shape == (2, 2, 3, 64, 96)
    np.testing.assert_allclose(mi["src_cam_poses"][0, 1], np.eye(4),
                               atol=1e-6)
    np.testing.assert_allclose(mi["src_cam_poses"][0, 0],
                               batch["T_left2right"], atol=1e-6)
    # right side uses the inverse baseline
    mi_r, _ = assemble_inputs(batch, "right", stereo=True)
    np.testing.assert_allclose(mi_r["src_cam_poses"][0, 0],
                               np.linalg.inv(batch["T_left2right"]),
                               atol=1e-5)

    cfg, model = _make("exp7")
    mi = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
          for k, v in mi.items()}
    out = _fwd(model, mi)
    assert np.isfinite(np.asarray(out["output_refined"][-1])).all()
