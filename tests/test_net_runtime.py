"""Trained-model-in-the-loop runtime (ros_net equivalent) e2e test:
checkpoint restore -> per-frame forward with prev_output feedback ->
in-process planner fusing curtain measurements back as prev_lc."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu.config import config_from_dict

W, H = 64, 48
D = 16


def _cfg(nmode="exp7_lc"):
    return config_from_dict({
        "data": {"exp_name": "nrt", "model_name": "base",
                 "loss_name": "base", "trainer_name": "default",
                 "dataset_path": "synthetic", "dataset_split": "k2"},
        "var": {"sigma_soft_max": 10.0, "t_win": 1, "d_min": 3.0,
                "d_max": 30.0, "feature_dim": 16, "ndepth": D,
                "softce": 0.3, "qpower": 1.0, "img_size": [W, H],
                "crop_w": W, "nmode": nmode, "bn_avg": False},
        "loss": {"ce_mul": 1.0, "dsc_mul": 0.0, "rsc_mul": 0.0,
                 "smooth_mul": 0.0, "dc_mul": 0.0, "rsc_low_mul": 0.0},
        "train": {"batch_size": 1, "lr": 1e-5, "epoch_num": 1, "n_gpu": 1,
                  "optim": "adam", "beta": 0.999, "momentum": 0.9,
                  "weight_decay": 1e-6, "bias_decay": 0.0},
    })


def _sensor_json():
    intr = [[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]]
    return {
        "intr_rgb": intr, "intr_lc": intr,
        "dist_rgb": [0] * 5, "dist_lc": [0] * 5,
        "size_rgb": [W, H], "size_lc": [W, H],
        "rTc": np.eye(4).tolist(),
        "lTc": [[1, 0, 0, 0.2], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        "left_2_right": np.eye(4).tolist(),
        "N": D, "s_range": 3.0, "e_range": 30.0, "q_power": 1.0,
        "laser_fov": 80.0, "laser_timestep": 2e-4,
        "unc_shift": -1e6, "unc_span": 2e6, "unc_ang": 0,
        "expand_A": D, "expand_B": D,
    }


def test_net_runtime_checkpoint_roundtrip_and_planner_loop(tmp_path):
    from depthestimation_tpu.models import get_model
    from depthestimation_tpu.parallel.train_step import init_state
    from depthestimation_tpu.runtime.net_runtime import NetRuntime
    from depthestimation_tpu.trainer.checkpoint import save_checkpoint

    cfg = _cfg()
    # save an (untrained) best checkpoint through the real trainer machinery
    rt_tmp = NetRuntime(cfg, _sensor_json(), mode="mono_lc",
                        variables={"params": {}})  # just for datum helpers
    mi = rt_tmp._model_input(
        [np.zeros((3, H, W), np.float32)] * 2, np.eye(4, dtype=np.float32))
    model = get_model(cfg)
    state, _ = init_state(model, cfg, mi, jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), cfg.data.exp_name, state, epoch=3,
                    is_best=True)

    rt = NetRuntime(_cfg(), _sensor_json(), mode="mono_lc",
                    save_root=str(tmp_path), planner="default",
                    planner_params={"step": [0.5], "std_div": 5.0})

    # restored params == saved params
    chex_leaf = jax.tree_util.tree_leaves(rt.variables["params"])[0]
    ref_leaf = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_allclose(np.asarray(chex_leaf), np.asarray(ref_leaf))

    rng = np.random.default_rng(0)
    depth_true = np.full((H, W), 10.0, np.float32)

    out1 = rt.process_frame(rng.random((3, H, W), dtype=np.float32),
                            depth_sense=depth_true)
    assert out1["depth"].shape == (H, W)
    assert np.all(np.isfinite(np.asarray(out1["depth"])))
    assert out1["dpv_refined"].shape[0] == D
    assert "lc_depth" in out1 and out1["lc_depth"].shape == (H, W)
    # log DPV normalizes
    s = np.exp(np.asarray(out1["dpv_refined"])).sum(0)
    np.testing.assert_allclose(s, 1.0, atol=1e-3)

    # feedback state is armed after the first frame, and processing the SAME
    # frame again produces a different output — prev_output/prev_lc carry
    # (truth convergence of the planner itself is pinned in test_runtime.py
    # and benchmarks/uf_convergence_curves.json; with an untrained network
    # integrated every frame it is not expected here)
    assert rt.prev_output is not None and rt.prev_lc is not None
    frame = rng.random((3, H, W), dtype=np.float32)
    out2 = rt.process_frame(frame, depth_sense=depth_true)
    out3 = rt.process_frame(frame, depth_sense=depth_true)
    assert not np.allclose(np.asarray(out2["depth"]),
                           np.asarray(out3["depth"]))

    # the planner consumed every frame and its fused depth stays physical
    assert rt.planner_rt.counter == 3
    fused_depth, _ = rt.planner_rt.extract_depth(var_thresh=1e9)
    fused = np.asarray(fused_depth)
    assert np.all(np.isfinite(fused))
    assert fused.min() >= 3.0 - 1e-3 and fused.max() <= 30.0 + 1e-3

    rt.reset()
    assert rt.prev_output is None and rt.prev_lc is None


@pytest.mark.slow
def test_net_runtime_stereo_mode():
    from depthestimation_tpu.models import get_model
    from depthestimation_tpu.runtime.net_runtime import NetRuntime

    rng = np.random.default_rng(1)
    # init variables through the runtime's own input assembly (no checkpoint)
    cfg = _cfg()
    tmp = NetRuntime(cfg, _sensor_json(), mode="stereo",
                     variables={"params": {}})
    mi = tmp._model_input([np.zeros((3, H, W), np.float32)] * 2,
                          np.eye(4, dtype=np.float32))
    model = get_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "lc_drop": jax.random.PRNGKey(1)}, mi,
                           train=False)
    rt = NetRuntime(_cfg(), _sensor_json(), mode="stereo",
                    variables=variables)
    out = rt.process_frame(rng.random((3, H, W), dtype=np.float32),
                           rgb_other=rng.random((3, H, W), dtype=np.float32))
    assert out["depth"].shape == (H, W)
    assert np.all(np.isfinite(np.asarray(out["depth"])))
