"""OXTS mercator pose conventions pinned against physical invariants.

The reference takes IMU poses from pykitti.raw (kitti.py:205-257), which
derives them with the KITTI devkit's mercator + roll/pitch/yaw formula.
pykitti is not installed here, and re-implementing the identical formula
as an "oracle" would share any sign slip — so these tests pin the
*physical meaning* of the poses on synthetic drives with real motion:

- mercator world positions (scale = cos(lat0)) must match an independent
  local-tangent-plane (equirectangular) projection to first order;
- straight driving at ANY heading must give a relative IMU pose whose
  translation is along body +x (forward), independent of yaw;
- a left turn (yaw increasing, counterclockwise from east) must appear as
  a positive rotation about body z between consecutive poses;
- the full calib chain (imu->velo->cam + src<-ref composition used by
  generate_item) must move a camera point by exactly the driven distance.

A sign slip in the translation axes, the R/t composition, or the rotation
matrices breaks these regardless of where it hides.
"""

import math
import os

import numpy as np
import pytest

from depthestimation_tpu.data.kitti import ER, _oxts_pose

LAT0 = 49.0  # deg; KITTI raw drives sit near this latitude


def _packets_for_track(east, north, alt, roll, pitch, yaw):
    """Convert a world-frame track (meters east/north, independent
    equirectangular tangent plane at LAT0) into OXTS packets."""
    packets = []
    lat = LAT0
    for i in range(len(east)):
        # invert the tangent plane step by step so lat-dependence of the
        # east scale is honored (not just the lat0 linearization)
        if i > 0:
            dlat = (north[i] - north[i - 1]) / ER
            lat = lat + math.degrees(dlat)
        lon = math.degrees(east[i] / (ER * math.cos(math.radians(lat))))
        p = np.zeros(30)
        p[0], p[1], p[2] = lat, lon, alt[i]
        p[3], p[4], p[5] = roll[i], pitch[i], yaw[i]
        packets.append(p)
    return packets


def _poses(packets):
    scale = math.cos(math.radians(packets[0][0]))
    return [_oxts_pose(p, scale) for p in packets]


def test_mercator_matches_tangent_plane():
    """World translation == the independent equirectangular projection."""
    n = 8
    east = np.linspace(0.0, 35.0, n)
    north = np.linspace(0.0, -20.0, n)
    alt = np.linspace(100.0, 103.0, n)
    zeros = np.zeros(n)
    poses = _poses(_packets_for_track(east, north, alt, zeros, zeros, zeros))

    p0 = poses[0][:3, 3]
    for i in range(1, n):
        d = poses[i][:3, 3] - p0
        np.testing.assert_allclose(
            d, [east[i], north[i], alt[i] - alt[0]], atol=2e-3,
            err_msg="mercator axes must be (east, north, up)")


@pytest.mark.parametrize("yaw_deg", [0.0, 37.0, 90.0, 155.0, -120.0])
def test_straight_drive_translates_along_body_x(yaw_deg):
    """rel = inv(T0) @ T1 must be a pure forward (+x) translation for any
    constant heading — catches R-transpose and t-composition slips."""
    yaw = math.radians(yaw_deg)
    d = 7.5
    n = 4
    east = np.array([d * i * math.cos(yaw) for i in range(n)])
    north = np.array([d * i * math.sin(yaw) for i in range(n)])
    alt = np.full(n, 50.0)
    zeros = np.zeros(n)
    poses = _poses(_packets_for_track(east, north, alt, zeros, zeros,
                                      np.full(n, yaw)))

    for i in range(n - 1):
        rel = np.linalg.inv(poses[i]) @ poses[i + 1]
        np.testing.assert_allclose(rel[:3, :3], np.eye(3), atol=1e-9)
        np.testing.assert_allclose(rel[:3, 3], [d, 0.0, 0.0], atol=5e-3,
                                   err_msg=f"heading {yaw_deg} deg: forward "
                                           "motion must be body +x")


def test_left_turn_is_positive_yaw_rate():
    """Counterclockwise arc: rel rotation must be +z, chord offset +y
    (body y is LEFT in the KITTI IMU frame)."""
    radius, dpsi, n = 30.0, math.radians(6.0), 6
    psi = np.array([i * dpsi for i in range(n)])
    # circle center at (0, radius): start heading east (yaw=0), turn left
    east = radius * np.sin(psi)
    north = radius * (1.0 - np.cos(psi))
    alt = np.full(n, 10.0)
    zeros = np.zeros(n)
    poses = _poses(_packets_for_track(east, north, alt, zeros, zeros, psi))

    chord = 2.0 * radius * math.sin(dpsi / 2.0)
    for i in range(n - 1):
        rel = np.linalg.inv(poses[i]) @ poses[i + 1]
        # rotation about +z by dpsi
        assert rel[1, 0] > 0, "left turn must be a positive z rotation"
        np.testing.assert_allclose(rel[1, 0], math.sin(dpsi), atol=1e-6)
        np.testing.assert_allclose(rel[2, 2], 1.0, atol=1e-9)
        # chord of a left arc: mostly forward, slightly to the left (+y)
        exp = [chord * math.cos(dpsi / 2.0), chord * math.sin(dpsi / 2.0),
               0.0]
        np.testing.assert_allclose(rel[:3, 3], exp, atol=5e-3)


def test_climb_stays_in_forward_vertical_plane():
    """Constant-heading climb with the body x axis aligned to the slope:
    the relative translation must be purely forward (body +x). Under the
    devkit's Ry = [[c,0,s],[0,1,0],[-s,0,c]] convention, body +x maps to
    world elevation -sin(ry): a NEGATIVE ry points the nose above the
    horizon, so the slope-aligned pitch packet value is -atan2(rise, d).
    (The same convention pykitti applies to the raw OXTS packet.)"""
    d, rise, n = 10.0, 1.5, 4
    yaw = math.radians(25.0)
    hyp = math.hypot(d, rise)
    pitch = -math.atan2(rise, d)  # nose above horizon under devkit Ry
    east = np.array([d * i * math.cos(yaw) for i in range(n)])
    north = np.array([d * i * math.sin(yaw) for i in range(n)])
    alt = np.array([50.0 + rise * i for i in range(n)])
    zeros = np.zeros(n)
    poses = _poses(_packets_for_track(east, north, alt, zeros,
                                      np.full(n, pitch), np.full(n, yaw)))

    for i in range(n - 1):
        rel = np.linalg.inv(poses[i]) @ poses[i + 1]
        np.testing.assert_allclose(rel[:3, :3], np.eye(3), atol=1e-9)
        np.testing.assert_allclose(rel[:3, 3], [hyp, 0.0, 0.0], atol=5e-3,
                                   err_msg="slope-aligned climb must be a "
                                           "pure body-forward translation")


def test_full_chain_camera_relative_pose(tmp_path):
    """generate_item's src<-ref composition through identity calib: a
    forward drive of d meters must map ref-camera coordinates to
    src-camera coordinates shifted by +d along the driving axis."""
    from tests.test_data import _write_mini_kitti
    from depthestimation_tpu.data.kitti import KittiDrive

    root, _ = _write_mini_kitti(str(tmp_path))
    date, drive = "2011_09_26", "0001"
    dpath = os.path.join(root, date, f"{date}_drive_{drive}_sync")

    # overwrite the fixture's near-zero motion with a real forward drive:
    # heading north (yaw=90 deg), 4 m per frame
    d = 4.0
    east = np.zeros(3)
    north = np.array([0.0, d, 2 * d])
    alt = np.full(3, 0.0)
    zeros = np.zeros(3)
    packets = _packets_for_track(east, north, alt, zeros, zeros,
                                 np.full(3, math.pi / 2))
    for t, p in enumerate(packets):
        np.savetxt(os.path.join(dpath, "oxts", "data", f"{t:010d}.txt"),
                   p[None])

    kd = KittiDrive(root, date, drive)
    m_imu2cam = kd.get_imu_2_leftcam()
    np.testing.assert_allclose(m_imu2cam, np.eye(4), atol=1e-12)

    ext = [m_imu2cam @ np.linalg.inv(kd.get_pose(j)) for j in range(3)]
    rel = ext[0] @ np.linalg.inv(ext[1])      # src(frame0) <- ref(frame1)
    np.testing.assert_allclose(rel[:3, :3], np.eye(3), atol=1e-9)
    # a world point fixed ahead of the car: in ref(frame1) coords it is
    # p1; in src(frame0), the car was d meters behind -> p0 = p1 + d*fwd.
    # With identity calib the "camera" axes are the IMU axes and forward
    # is body +x.
    np.testing.assert_allclose(rel[:3, 3], [d, 0.0, 0.0], atol=5e-3)
