"""Galvo-constrained curtain planner (PlannerRT equivalent), pure JAX.

Replaces the reference's C++ ``planner.PlannerRT`` (lc/light_curtain.py:
302-304, 559, 688): dynamic programming over the (camera ray, range) node
graph maximizing the summed cost field subject to the galvo's angular
velocity limit between consecutive rays.

The DP is a ``lax.scan`` over camera columns whose step is a masked
max-plus contraction over the [R, R] transition — entirely on-device,
O(C·R²) ~ 8M VPU ops per plan, so planning costs microseconds instead of
the reference's ~ms C++ round-trip (and it vmaps over a batch of fields).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30


class PlannerRT:
    """PlannerRT(lc_device, ranges[R], num_camera_rays).

    When the device carries a finite galvo acceleration limit
    (``max_alpha`` in LASER_PARAMS, deg/s²), the DP state is extended from
    (ray, range) to (ray, range_prev, range) so both the angular-velocity
    limit AND the velocity-change limit between consecutive rays are
    enforced — the full constraint set of the reference's C++ PlannerRT
    (SURVEY §2.5; reconstructed from lc/light_curtain.py:302-304 call-site
    semantics, lcsim source absent). ``max_alpha=None`` keeps the
    velocity-only graph.
    """

    def __init__(self, lc_device, ranges, num_camera_rays: int, debug: bool = False):
        self.device = lc_device
        self.ranges = np.asarray(ranges, np.float64)             # [R]
        self.C = int(num_camera_rays)
        assert self.C == lc_device.width, "planner rays must match device"

        thetas = np.radians(lc_device.thetas)                    # [C]
        r = self.ranges[None, :]                                 # [1, R]
        x = r * np.sin(thetas[:, None])                          # [C, R]
        z = r * np.cos(thetas[:, None])
        pts = np.stack([x, z, np.zeros_like(x), np.ones_like(x)], 0)
        # camera (x, y=0, z) -> laser frame; galvo angle = atan2(x_l, z_l)
        ltc = lc_device.lTc
        xl = ltc[0, 0] * x + ltc[0, 2] * z + ltc[0, 3]
        zl = ltc[2, 0] * x + ltc[2, 2] * z + ltc[2, 3]
        del pts
        self.phi = np.degrees(np.arctan2(xl, zl))                # [C, R]
        self.dphi_max = lc_device.max_omega * lc_device.laser_timestep
        max_alpha = getattr(lc_device, "max_alpha", None)
        self.ddphi_max = (None if max_alpha is None else
                          float(max_alpha) * lc_device.laser_timestep ** 2)

        self._phi_j = jnp.asarray(self.phi, jnp.float32)
        self._xz = jnp.asarray(np.stack([x, z], axis=-1), jnp.float32)  # [C,R,2]

        if self.ddphi_max is None:
            self._solve = jax.jit(functools.partial(
                _dp_solve, phi=self._phi_j, xz=self._xz,
                dphi_max=float(self.dphi_max)))
        else:
            self._solve = jax.jit(functools.partial(
                _dp_solve_accel, phi=self._phi_j, xz=self._xz,
                dphi_max=float(self.dphi_max),
                ddphi_max=float(self.ddphi_max)))

    def get_design_points(self, cost_field):
        """cost_field: [R, C] -> design points [C, 2] (x, z)."""
        return self._solve(jnp.asarray(cost_field, jnp.float32))

    def solve_fn(self):
        """The raw jittable solver (for fusion into larger programs)."""
        if self.ddphi_max is not None:
            return functools.partial(_dp_solve_accel, phi=self._phi_j,
                                     xz=self._xz, dphi_max=float(self.dphi_max),
                                     ddphi_max=float(self.ddphi_max))
        return functools.partial(_dp_solve, phi=self._phi_j, xz=self._xz,
                                 dphi_max=float(self.dphi_max))


def _dp_solve(field, *, phi, xz, dphi_max):
    """field: [R, C]; phi: [C, R]; xz: [C, R, 2] -> pts [C, 2]."""
    field = jnp.nan_to_num(jnp.asarray(field, jnp.float32), nan=0.0)
    fT = field.T                                                 # [C, R]
    c, r = fT.shape

    def fwd(carry, inputs):
        best_prev, phi_prev = carry
        f_c, phi_c = inputs                                      # [R], [R]
        mask = jnp.abs(phi_c[None, :] - phi_prev[:, None]) <= dphi_max
        scores = best_prev[:, None] + jnp.where(mask, 0.0, NEG)  # [R, R]
        best = f_c + jnp.max(scores, axis=0)
        ptr = jnp.argmax(scores, axis=0).astype(jnp.int32)
        return (best, phi_c), ptr

    init = (fT[0], phi[0])
    # unroll amortizes the TPU per-step loop overhead over 8 tiny [R, R]
    # column updates (the solve is overhead-bound, not FLOP-bound)
    (best_last, _), ptrs = jax.lax.scan(fwd, init, (fT[1:], phi[1:]),
                                        unroll=4)
    # ptrs: [C-1, R]; backtrack
    r_last = jnp.argmax(best_last).astype(jnp.int32)

    def bwd(r_next, ptr_c):
        r_cur = ptr_c[r_next]
        return r_cur, r_cur

    _, rs_rev = jax.lax.scan(bwd, r_last, ptrs, reverse=True, unroll=4)
    rs = jnp.concatenate([rs_rev, r_last[None]])                 # [C]
    return jax.vmap(lambda i, row: row[i])(rs, xz)               # [C, 2]


def _dp_solve_accel(field, *, phi, xz, dphi_max, ddphi_max):
    """Velocity- AND acceleration-constrained DP.

    State after column c is the (range at c-1, range at c) pair, so the
    galvo velocity implied by the last hop is part of the node; a hop to
    r_next is feasible iff the new velocity is within ``dphi_max`` and
    differs from the previous one by at most ``ddphi_max`` (= max_alpha·dt²).
    O(C·R³) max-plus work, still one fused on-device scan.

    field: [R, C]; phi: [C, R]; xz: [C, R, 2] -> pts [C, 2].
    """
    field = jnp.nan_to_num(jnp.asarray(field, jnp.float32), nan=0.0)
    fT = field.T                                                 # [C, R]
    c, r = fT.shape

    # init over the first two columns: velocity constraint only
    v01 = phi[1][None, :] - phi[0][:, None]                      # [R, R]
    best0 = (fT[0][:, None] + fT[1][None, :] +
             jnp.where(jnp.abs(v01) <= dphi_max, 0.0, NEG))      # [Rprev, Rcur]

    def fwd(carry, inputs):
        best, phi_prev, phi_cur = carry                          # [R, R], [R], [R]
        f_n, phi_n = inputs                                      # [R], [R]
        v_new = phi_n[None, :] - phi_cur[:, None]                # [Rcur, Rnext]
        v_old = phi_cur[None, :] - phi_prev[:, None]             # [Rprev, Rcur]
        ok = ((jnp.abs(v_new)[None] <= dphi_max) &
              (jnp.abs(v_new[None] - v_old[:, :, None]) <= ddphi_max))
        scores = best[:, :, None] + jnp.where(ok, 0.0, NEG)      # [Rp, Rc, Rn]
        new_best = f_n[None, :] + jnp.max(scores, axis=0)        # [Rc, Rn]
        ptr = jnp.argmax(scores, axis=0).astype(jnp.int32)       # [Rc, Rn]
        return (new_best, phi_cur, phi_n), ptr

    (best_last, _, _), ptrs = jax.lax.scan(
        fwd, (best0, phi[0], phi[1]), (fT[2:], phi[2:]), unroll=4)
    # best_last: [R(c-2), R(c-1)]; ptrs: [C-2, Rcur, Rnext]
    flat = jnp.argmax(best_last)
    r_prev = (flat // r).astype(jnp.int32)
    r_last = (flat % r).astype(jnp.int32)

    def bwd(carry, ptr_c):
        r_cur, r_next = carry
        r_p = ptr_c[r_cur, r_next]
        return (r_p, r_cur), r_p

    _, rs_rev = jax.lax.scan(bwd, (r_prev, r_last), ptrs, reverse=True)
    rs = jnp.concatenate([rs_rev, r_prev[None], r_last[None]])   # [C]
    return jax.vmap(lambda i, row: row[i])(rs, xz)               # [C, 2]
