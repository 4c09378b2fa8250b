"""Geometry primitives: golden tests vs direct NumPy computations."""

import numpy as np
import jax.numpy as jnp

from edge_based_visual_odometry_tpu import geometry as geom
from edge_based_visual_odometry_tpu.config import CameraConfig, StereoRig


def random_rotation(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def make_rig():
    cam = CameraConfig(width=640, height=480, fx=500.0, fy=505.0,
                       cx=320.0, cy=240.0)
    return StereoRig(left=cam, right=cam,
                     R21=((1, 0, 0), (0, 1, 0), (0, 0, 1)),
                     T21=(-0.1, 0.0, 0.0))


def test_pose_roundtrip(rng):
    R = random_rotation(rng)
    t = rng.normal(size=3)
    p = geom.Pose(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
    pts = rng.normal(size=(5, 3)).astype(np.float32)
    out = p.transform(jnp.asarray(pts))
    back = p.detransform(out)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)
    inv = p.inverse()
    out2 = inv.transform(out)
    np.testing.assert_allclose(np.asarray(out2), pts, atol=1e-5)


def test_relative_pose(rng):
    """rel = target . source^-1 (reference src/utility.cpp:121-126)."""
    Rs, ts = random_rotation(rng), rng.normal(size=3)
    Rt, tt = random_rotation(rng), rng.normal(size=3)
    src = geom.Pose(jnp.asarray(Rs, jnp.float32), jnp.asarray(ts, jnp.float32))
    tgt = geom.Pose(jnp.asarray(Rt, jnp.float32), jnp.asarray(tt, jnp.float32))
    rel = geom.relative_pose(src, tgt)
    p = rng.normal(size=3).astype(np.float32)
    world = src.transform(jnp.asarray(p))
    # point expressed in src frame -> world? src maps world->cam; rel maps
    # src-cam coords to tgt-cam coords:
    via = rel.transform(src.transform(jnp.asarray(p)))
    direct = tgt.transform(jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(via), np.asarray(direct), atol=1e-4)


def test_epipolar_line_and_distance():
    rig = make_rig()
    F = jnp.asarray(rig.F21, jnp.float32)
    # With pure horizontal baseline, epipolar lines are horizontal:
    # a matching right point at same y must be on the line.
    xy_l = jnp.asarray([[100.0, 120.0]], jnp.float32)
    lines = geom.epipolar_lines(F, xy_l)
    d_same_row = geom.point_line_distance(lines, jnp.asarray([[80.0, 120.0]], jnp.float32))
    d_off_row = geom.point_line_distance(lines, jnp.asarray([[80.0, 123.0]], jnp.float32))
    assert float(d_same_row[0]) < 1e-3
    assert abs(float(d_off_row[0]) - 3.0) < 1e-3


def test_normal_foot_on_line():
    line = jnp.asarray([0.0, 1.0, -5.0], jnp.float32)  # y = 5
    foot, dist = geom.normal_foot_on_line(line, jnp.asarray([3.0, 9.0], jnp.float32))
    np.testing.assert_allclose(np.asarray(foot), [3.0, 5.0], atol=1e-5)
    assert abs(float(dist) - 4.0) < 1e-5


def test_tangential_intersection():
    # Edge at (0, 0) with 45 deg orientation; line y = 2 -> intersection (2, 2)
    line = jnp.asarray([0.0, 1.0, -2.0], jnp.float32)
    inter, disp = geom.tangential_intersection_with_line(
        line, jnp.asarray([0.0, 0.0], jnp.float32),
        jnp.asarray(np.pi / 4, jnp.float32))
    np.testing.assert_allclose(np.asarray(inter), [2.0, 2.0], atol=1e-4)
    np.testing.assert_allclose(float(disp), np.sqrt(8.0), atol=1e-4)


def test_backproject_two_rays_recovers_depth():
    rig = make_rig()
    K_inv = jnp.asarray(rig.left.K_inv, jnp.float32)
    R21 = jnp.asarray(rig.R21_np, jnp.float32)
    T21 = jnp.asarray(rig.T21_np, jnp.float32)
    P = np.array([0.3, -0.2, 4.0])
    P2 = rig.R21_np @ P + rig.T21_np
    K = rig.left.K
    uv1 = (K @ P)[:2] / P[2]
    uv2 = (K @ P2)[:2] / P2[2]
    ray1 = geom.pixel_to_ray(K_inv, jnp.asarray(uv1, jnp.float32))
    ray2 = geom.pixel_to_ray(K_inv, jnp.asarray(uv2, jnp.float32))
    G = geom.backproject_two_rays(R21, T21, ray1, ray2)
    np.testing.assert_allclose(np.asarray(G), P, rtol=1e-4)


def test_tangent_reconstruction_and_projection():
    """A 3D line's tangent must be recovered from its two projections
    (reference src/utility.cpp:104-119)."""
    rig = make_rig()
    K = rig.left.K
    K_inv = rig.left.K_inv
    P = np.array([0.1, 0.05, 3.0])
    T3d = np.array([0.6, 0.8, 0.0])
    T3d = T3d / np.linalg.norm(T3d)
    # Project line points into both cameras, compute 2D tangents
    eps = 1e-3
    def proj(pt, R=np.eye(3), t=np.zeros(3)):
        q = R @ pt + t
        uv = (K @ q)[:2] / q[2]
        return uv
    t2d_1 = proj(P + eps * T3d) - proj(P)
    t2d_2 = proj(P + eps * T3d, rig.R21_np, rig.T21_np) - proj(P, rig.R21_np, rig.T21_np)
    th1 = np.arctan2(t2d_1[1], t2d_1[0])
    th2 = np.arctan2(t2d_2[1], t2d_2[0])

    g1 = geom.pixel_to_ray(jnp.asarray(K_inv, jnp.float32), jnp.asarray(proj(P), jnp.float32))
    g2 = geom.pixel_to_ray(jnp.asarray(K_inv, jnp.float32),
                           jnp.asarray(proj(P, rig.R21_np, rig.T21_np), jnp.float32))
    t1 = geom.theta_to_ray_tangent(jnp.asarray(K_inv, jnp.float32), jnp.asarray(th1, jnp.float32))
    t2 = geom.theta_to_ray_tangent(jnp.asarray(K_inv, jnp.float32), jnp.asarray(th2, jnp.float32))
    T_rec = geom.reconstruct_3d_tangent(
        jnp.asarray(rig.R21_np, jnp.float32), g1, g2, t1, t2)
    T_rec = np.asarray(T_rec)
    # Sign-insensitive direction match
    assert min(np.linalg.norm(T_rec - T3d), np.linalg.norm(T_rec + T3d)) < 1e-3

    # project_3D_Tangent_to_2D_Tangent should match the finite-difference 2D
    # tangent direction in normalized coordinates
    t2d_rec = geom.project_3d_tangent_to_2d(jnp.asarray(T_rec, jnp.float32), g1)
    t2d_rec = np.asarray(t2d_rec)[:2]
    t_ref = np.asarray(t1)[:2] / np.linalg.norm(np.asarray(t1)[:2])
    t2d_rec = t2d_rec / np.linalg.norm(t2d_rec)
    assert min(np.linalg.norm(t2d_rec - t_ref), np.linalg.norm(t2d_rec + t_ref)) < 1e-3


def test_two_view_triangulation(rng):
    rig = make_rig()
    P = np.array([0.4, -0.3, 5.0])
    K = rig.left.K
    uv1 = (K @ P)[:2] / P[2]
    P2 = rig.R21_np @ P + rig.T21_np
    uv2 = (K @ P2)[:2] / P2[2]
    X = geom.two_view_linear_triangulation(
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.asarray(rig.left.K_inv, jnp.float32),
        jnp.asarray(rig.right.K_inv, jnp.float32),
        jnp.asarray(rig.R21_np, jnp.float32), jnp.asarray(rig.T21_np, jnp.float32))
    np.testing.assert_allclose(np.asarray(X), P, rtol=1e-3)


def test_multiview_triangulation(rng):
    rig = make_rig()
    K = rig.left.K
    P = np.array([0.2, 0.1, 4.0])
    poses = []
    pts = [(K @ P)[:2] / P[2]]
    for k in range(3):
        R = random_rotation(rng) * 0.0 + np.eye(3)
        t = np.array([0.2 * (k + 1), 0.0, 0.0])
        q = R @ P + t
        pts.append((K @ q)[:2] / q[2])
        poses.append((R, t))
    Rs = jnp.asarray(np.stack([p[0] for p in poses]), jnp.float32)
    Ts = jnp.asarray(np.stack([p[1] for p in poses]), jnp.float32)
    X = geom.multiview_linear_triangulation(
        jnp.asarray(np.stack(pts), jnp.float32), Rs, Ts,
        jnp.asarray(rig.left.K_inv, jnp.float32))
    np.testing.assert_allclose(np.asarray(X), P, rtol=1e-3)


def test_orientation_diff_and_gate():
    th1 = jnp.asarray(np.deg2rad(170.0), jnp.float32)
    th2 = jnp.asarray(np.deg2rad(-175.0), jnp.float32)
    d = geom.orientation_diff_deg(th1, th2)
    assert abs(float(d) - 15.0) < 1e-4
    assert bool(geom.orientation_gate(jnp.asarray(175.0), 10.0))
    assert not bool(geom.orientation_gate(jnp.asarray(90.0), 10.0))


def test_fundamental_matrix_epipolar_constraint(rng):
    cam = CameraConfig(width=640, height=480, fx=450.0, fy=455.0, cx=320.0, cy=240.0)
    R21 = random_rotation(rng)
    # small rotation: blend with identity
    R21 = np.eye(3) + 0.05 * (R21 - R21.T) / 2
    U, _, Vt = np.linalg.svd(R21)
    R21 = U @ Vt
    T21 = np.array([-0.12, 0.01, 0.005])
    rig = StereoRig(left=cam, right=cam,
                    R21=tuple(tuple(r) for r in R21), T21=tuple(T21))
    for _ in range(10):
        P = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(2, 8)])
        uv1 = (cam.K @ P)[:2] / P[2]
        P2 = R21 @ P + T21
        uv2 = (cam.K @ P2)[:2] / P2[2]
        line = geom.epipolar_lines(jnp.asarray(rig.F21, jnp.float32),
                                   jnp.asarray(uv1, jnp.float32))
        d = geom.point_line_distance(line, jnp.asarray(uv2, jnp.float32))
        assert float(d) < 1e-2
