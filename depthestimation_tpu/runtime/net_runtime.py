"""Trained-model-in-the-loop inference runtime (ros_net equivalent).

Rebuild of the reference's ROS inference node (ros/ros_net.py:87-355)
without ROS: loads a trained checkpoint by deployment mode, builds the
static per-frame ``model_input`` from a sensor-parameter JSON (intrinsics,
unit rays, poses — ros_net.py:175-239), runs the jitted network forward per
incoming frame with ``prev_output`` feedback (ros_net.py:268-294), and
optionally drives an in-process :class:`PlannerRuntime` whose fused
light-curtain DPV is fed back as ``prev_lc`` (ros_net.py:288-297).

Frames arrive via :meth:`process_frame`; the ROS topic plumbing is replaced
by plain calls (see ``ReplayDriver`` in planner_runtime.py for the batch
replay equivalent of the subscriber loop).
"""

from __future__ import annotations

import json
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.ops import dpv as dpv_ops
from depthestimation_tpu.ops import geometry
from depthestimation_tpu.ops.ufield import UFieldParams, gen_ufield
from depthestimation_tpu.runtime.planner_runtime import (
    PlannerRuntime,
    process_lc_json,
)

#: deployment mode -> model nmode + stereo flag (ros_net.py:149-173 maps
#: mode strings to config+checkpoint pairs; the nmode is what changes)
MODES = {
    "mono": {"nmode": "exp7", "stereo": False},
    "stereo": {"nmode": "exp7", "stereo": True},
    "mono_lc": {"nmode": "exp7_lc", "stereo": False},
    "stereo_lc": {"nmode": "exp7_lc", "stereo": True},
}


class NetRuntime:
    """Persistent network inference loop over sensor-JSON calibration.

    Args:
      cfg: framework config (defines the model; ``cfg.var.nmode`` is
        overridden by ``mode``).
      sensor_json: path or dict of device calibration (real_sensor.json
        schema).
      mode: one of ``MODES``.
      variables: model variables. When None, the best checkpoint of
        ``cfg.data.exp_name`` is restored from ``save_root``
        (ros_net.py:166-173 loads ``*_model_best``).
      save_root: checkpoint directory (required when ``variables`` is None).
      planner: optional planner name ("default"/"m1"/"sweep") — enables the
        in-process sense-plan-integrate loop whose output feeds ``prev_lc``.
    """

    def __init__(self, cfg, sensor_json, mode: str = "mono",
                 variables=None, save_root: Optional[str] = None,
                 planner: Optional[str] = None,
                 planner_params: Optional[dict] = None):
        from depthestimation_tpu.models import get_model

        spec = MODES[mode]
        self.mode = mode
        self.stereo = spec["stereo"]
        cfg.var.nmode = spec["nmode"]
        self.cfg = cfg
        self.model = get_model(cfg)

        raw = (json.load(open(sensor_json)) if isinstance(sensor_json, str)
               else sensor_json)
        self.param = process_lc_json(raw)
        self._build_static_datum(raw)

        t_win = int(cfg.var.get("t_win", 1))
        self.n_views = 2 if self.stereo else t_win + 1
        self.prev_output = None
        self.prev_lc = None

        if variables is None:
            variables = self._restore(save_root)
        self.variables = variables

        def _fwd_post(v, m):
            """Forward + ALL per-frame post-processing in one program —
            the eager resize/normalize/ufield chain was ~10 extra host
            dispatches per frame on the tunneled runtime."""
            out = self.model.apply(v, m, train=False,
                                   rngs={"lc_drop": jax.random.PRNGKey(0)})
            dpv_refined = out["output_refined"][-1][0]       # [D, H, W] log
            low = out["output"][-1][0]                       # [D, h, w] log
            p = jax.image.resize(jnp.exp(dpv_refined)[None],
                                 (1,) + tuple(low.shape), method="linear")
            p = p / jnp.sum(p, axis=1, keepdims=True)
            prev_output = jnp.log(jnp.clip(p, 1e-16, 1.0))
            depth = dpv_ops.dpv_to_depthmap(
                dpv_refined[None], jnp.asarray(self.d_candi), log=True)[0]
            uf, _ = gen_ufield(dpv_refined,
                               jnp.asarray(self.d_candi, jnp.float32),
                               jnp.asarray(self.intr_up, jnp.float32),
                               self.uf_params, log=True)
            return dpv_refined, low, prev_output, depth, uf

        self._forward = jax.jit(_fwd_post)

        def _lc_feedback(final, low):
            fused = dpv_ops.upsample_dpv(jnp.exp(final), low.shape[0],
                                         log=False)
            fused = jax.image.resize(fused, (1,) + tuple(low.shape),
                                     method="linear")
            fused = fused / jnp.sum(fused, axis=1, keepdims=True)
            return jnp.log(jnp.clip(fused, 1e-16, 1.0))

        self._lc_feedback = jax.jit(_lc_feedback)

        self.planner_rt = None
        if planner is not None:
            self.planner_rt = PlannerRuntime(
                raw, mode="sim", planner=planner,
                params=planner_params or {"step": [0.5], "std_div": 5.0})

        self._frames: deque = deque(maxlen=self.n_views)

    # -- static model datum (ros_net.py:175-239) ---------------------------

    def _build_static_datum(self, raw: dict):
        w, h = self.param["size_rgb"]
        intr_up = np.asarray(self.param["intr_rgb"], np.float32)
        intr = geometry.intr_scale_unit(intr_up, 0.25)
        intr[2, 2] = 1.0
        hfov, vfov = geometry.fov_from_intrinsics(intr, w // 4, h // 4)
        rays = geometry.unit_ray_array_2d(w // 4, h // 4, hfov, vfov)
        self.size = (w, h)
        self.intr = intr
        self.intr_up = intr_up
        self.unit_ray = rays
        self.left_2_right = np.asarray(
            raw.get("left_2_right", np.eye(4)), np.float32)
        var = self.cfg.var
        self.d_candi = dpv_ops.powerf(var.d_min, var.d_max, var.ndepth,
                                      var.qpower)
        self.d_candi_up = dpv_ops.powerf(var.d_min, var.d_max,
                                         var.ndepth * 2, var.qpower)
        self.uf_params = (UFieldParams.from_sensor(
            raw["unc_shift"], raw["unc_span"], raw.get("unc_ang", 0))
            if "unc_shift" in raw else
            UFieldParams(pshift=0, zstart=1.0, zend=1.3, maxd=100.0,
                         mind=3.0, quash=True))

    def _restore(self, save_root: str):
        from depthestimation_tpu.trainer.checkpoint import load_checkpoint
        assert save_root is not None, "save_root needed to restore a model"
        mi = self._model_input([np.zeros((3, self.size[1], self.size[0]),
                                         np.float32)] * self.n_views,
                               np.eye(4, dtype=np.float32))
        # checkpoints store the full train state; restore params/batch_stats
        from depthestimation_tpu.parallel.train_step import init_state
        state, _ = init_state(self.model, self.cfg, mi, jax.random.PRNGKey(0))
        state, _epoch = load_checkpoint(save_root, self.cfg.data.exp_name,
                                        state, best=True)
        out = {"params": state.params}
        if getattr(state, "batch_stats", None):
            out["batch_stats"] = state.batch_stats
        return out

    # -- per-frame input assembly ------------------------------------------

    def _model_input(self, rgb_views, rel_pose):
        """rgb_views: list of [3, H, W] float arrays (oldest..newest; for
        stereo: [other side, this side]); rel_pose: src<-ref 4x4."""
        n = len(rgb_views)
        rgb = np.stack(rgb_views)[None]                      # [1, T, 3, H, W]
        poses = np.stack([np.eye(4, dtype=np.float32)] * n)
        if self.stereo:
            poses[0] = self.left_2_right
        else:
            # constant-velocity pose chain: view v is (n-1-v) steps back
            for v in range(n - 1):
                p = np.eye(4, dtype=np.float32)
                step = np.asarray(rel_pose, np.float32)
                for _ in range(n - 1 - v):
                    p = step @ p
                poses[v] = p
        return {
            "rgb": jnp.asarray(rgb),
            "intrinsics": jnp.asarray(self.intr)[None],
            "intrinsics_up": jnp.asarray(self.intr_up)[None],
            "unit_ray": jnp.asarray(self.unit_ray)[None],
            "src_cam_poses": jnp.asarray(poses)[None],
            "d_candi": jnp.asarray(self.d_candi, jnp.float32),
            "d_candi_up": jnp.asarray(self.d_candi_up, jnp.float32),
            "prev_output": self.prev_output,
            "prev_lc": self.prev_lc,
        }

    # -- the per-message handler (ros_net.handle_msg) ------------------------

    def process_frame(self, rgb, rgb_other=None, rel_pose=None,
                      depth_sense=None):
        """One inference step.

        Args:
          rgb: [3, H, W] newest frame (reference view).
          rgb_other: stereo partner frame (stereo modes).
          rel_pose: src<-ref inter-frame pose (mono modes; default identity).
          depth_sense: true depth [H, W] for simulated curtain sensing when a
            planner is attached (the real device measures instead).

        Returns dict: depth [H, W], dpv_refined [D, H, W] (log), uf [D, W],
        and (when a planner runs) lc_depth from the fused planner state.
        """
        if self.stereo:
            assert rgb_other is not None, "stereo mode needs rgb_other"
            views = [np.asarray(rgb_other, np.float32),
                     np.asarray(rgb, np.float32)]
        else:
            self._frames.append(np.asarray(rgb, np.float32))
            while len(self._frames) < self.n_views:
                self._frames.append(np.asarray(rgb, np.float32))
            views = list(self._frames)
        rel_pose = (np.eye(4, dtype=np.float32) if rel_pose is None
                    else rel_pose)

        mi = self._model_input(views, rel_pose)
        # prev_output feedback: ¼-res refined, detached (ros_net.py:272-277)
        dpv_refined, low, self.prev_output, depth, uf = self._forward(
            self.variables, mi)

        result = {"depth": depth, "dpv_refined": dpv_refined, "uf": uf,
                  "dpv_low": low}

        if self.planner_rt is not None and depth_sense is not None:
            lc_depth, mask = self.planner_rt.run(dpv_refined[None],
                                                 depth_sense)
            # fused planner DPV feeds back as prev_lc at low res: depth axis
            # back to D bins, then spatial ¼ (ros_net.py:288-297)
            self.prev_lc = self._lc_feedback(self.planner_rt.final, low)
            result["lc_depth"] = lc_depth
            result["lc_mask"] = mask
        return result

    def reset(self):
        self._frames.clear()
        self.prev_output = None
        self.prev_lc = None
        if self.planner_rt is not None:
            self.planner_rt.init_unc_field()
