"""Golden tests for geometry vs. independent numpy formulations.

The numpy oracles below re-derive the math from the reference's documented
conventions (depth_utils.py numpy twins, :37-126) without sharing code with
the jnp implementations under test.
"""

import numpy as np
import pytest

from peanut_tpu.geometry import (
    get_camera_matrix,
    point_cloud_from_depth,
    transform_camera_view,
    transform_pose,
    get_rel_pose_change,
    get_new_pose,
    integrate_pose,
)


def np_point_cloud(depth, cam, scale=1):
    h, w = depth.shape[-2:]
    x, z = np.meshgrid(np.arange(w), np.arange(h - 1, -1, -1))
    for _ in range(depth.ndim - 2):
        x = x[None]
        z = z[None]
    X = (x[..., ::scale, ::scale] - cam.xc) * depth[..., ::scale, ::scale] / cam.f
    Z = (z[..., ::scale, ::scale] - cam.zc) * depth[..., ::scale, ::scale] / cam.f
    return np.stack([X, depth[..., ::scale, ::scale], Z], axis=-1)


def test_camera_matrix():
    cam = get_camera_matrix(640, 480, 79.0)
    assert cam.xc == pytest.approx(319.5)
    assert cam.zc == pytest.approx(239.5)
    assert cam.f == pytest.approx(320.0 / np.tan(np.deg2rad(39.5)))


def test_point_cloud_matches_numpy(rng):
    cam = get_camera_matrix(64, 48, 79.0)
    depth = rng.rand(2, 48, 64).astype(np.float32) * 500.0
    got = np.asarray(point_cloud_from_depth(depth, cam))
    want = np_point_cloud(depth, cam)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_point_cloud_scale(rng):
    cam = get_camera_matrix(64, 48, 79.0)
    depth = rng.rand(1, 48, 64).astype(np.float32) * 500.0
    got = np.asarray(point_cloud_from_depth(depth, cam, scale=2))
    assert got.shape == (1, 24, 32, 3)
    want = np_point_cloud(depth, cam, scale=2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_transform_camera_view_elevation_zero(rng):
    # elevation 0 => identity rotation + height lift (the PEANUT call path,
    # mapping.py:62-63)
    xyz = rng.randn(5, 7, 3).astype(np.float32)
    got = np.asarray(transform_camera_view(xyz, 88.0, 0.0))
    want = xyz.copy()
    want[..., 2] += 88.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_transform_camera_view_rotates():
    xyz = np.array([[[0.0, 1.0, 0.0]]], dtype=np.float32)
    got = np.asarray(transform_camera_view(xyz, 0.0, 90.0))
    # rotating (0,1,0) about +x by 90deg -> (0,0,1)
    np.testing.assert_allclose(got, [[[0.0, 0.0, 1.0]]], atol=1e-6)


def test_transform_pose_shift():
    # theta = pi/2 => rotation angle 0 (theta - pi/2); pure translation
    xyz = np.ones((2, 3, 3), dtype=np.float32)
    got = np.asarray(transform_pose(xyz, (250.0, 0.0, np.pi / 2)))
    want = xyz.copy()
    want[..., 0] += 250.0
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pose_roundtrip():
    p1 = (1.0, 2.0, 0.3)
    p2 = (1.5, 2.5, 0.8)
    dx, dy, do = get_rel_pose_change(p2, p1)
    x, y, o = get_new_pose((p1[0], p1[1], np.rad2deg(p1[2])), (dx, dy, do))
    assert x == pytest.approx(p2[0], abs=1e-6)
    assert y == pytest.approx(p2[1], abs=1e-6)
    assert np.deg2rad(o) == pytest.approx(p2[2], abs=1e-6)


def test_integrate_pose_matches_scalar():
    pose = np.array([[24.0, 24.0, 30.0]], dtype=np.float32)
    rel = np.array([[0.25, 0.1, 0.1]], dtype=np.float32)
    got = np.asarray(integrate_pose(pose, rel))[0]
    x, y, o = get_new_pose(tuple(pose[0]), tuple(rel[0]))
    np.testing.assert_allclose(got, [x, y, o], rtol=1e-5)


def test_integrate_pose_heading_wrap():
    pose = np.array([[0.0, 0.0, 179.0]], dtype=np.float32)
    rel = np.array([[0.0, 0.0, np.deg2rad(10.0)]], dtype=np.float32)
    got = np.asarray(integrate_pose(pose, rel))[0]
    assert got[2] == pytest.approx(-171.0, abs=1e-4)
