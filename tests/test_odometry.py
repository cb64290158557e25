"""Dense odometry tests on synthetic rendered frames with known motion.

Validates the TPU GN solver against ground truth the way the reference is only
validated manually (SURVEY.md §4): render frame A at identity, frame B at a
known camera pose, and require the estimated pose to recover it.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import synthetic
from multimotionfusion_tpu.config import CameraModel, OdometryConfig
from multimotionfusion_tpu.odometry import rgbd
from multimotionfusion_tpu.odometry.levels import build_frame_pyramids, build_level_data
from multimotionfusion_tpu.ops import image as imops
from multimotionfusion_tpu.ops import maps as mapops

CAM = CameraModel(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)


def make_inputs(T_cam_b, cfg, T_prev=None):
    """Frame A (identity pose) acts as 'prediction'; frame B is the new frame."""
    depth_a, rgb_a = synthetic.render(np.eye(4, dtype=np.float32), CAM)
    depth_b, rgb_b = synthetic.render(T_cam_b, CAM)

    mask = jnp.zeros((CAM.height, CAM.width), jnp.int32)
    frame = build_frame_pyramids(jnp.asarray(depth_b), jnp.asarray(rgb_b), mask, cfg)

    pred_vmap = mapops.create_vmap(jnp.asarray(depth_a), CAM, 5.0)
    pred_nmap = mapops.create_nmap(pred_vmap)
    pred_int = imops.rgb_to_intensity(jnp.asarray(rgb_a))

    levels = build_level_data(
        frame, pred_vmap, pred_nmap, pred_int, CAM, cfg
    )
    last_l2 = imops.build_pyramid(pred_int, cfg.num_pyr)[cfg.num_pyr - 1]
    return levels, last_l2


def pose_error(T_est, T_true):
    delta = np.linalg.inv(np.asarray(T_true)) @ np.asarray(T_est)
    rot_err = np.arccos(np.clip((np.trace(delta[:3, :3]) - 1) / 2, -1, 1))
    trans_err = np.linalg.norm(delta[:3, 3])
    return rot_err, trans_err


@pytest.mark.parametrize(
    "rotvec,trans",
    [
        ((0.0, 0.0, 0.0), (0.01, 0.0, 0.0)),
        ((0.0, 0.02, 0.0), (0.0, 0.0, 0.01)),
        ((0.01, -0.015, 0.02), (0.008, -0.005, 0.012)),
    ],
)
def test_recovers_small_motion(rotvec, trans):
    cfg = OdometryConfig(mask_icp=False, mask_rgb=False)
    T_true = synthetic.pose(rotvec, trans)
    levels, last_l2 = make_inputs(T_true, cfg)
    res = rgbd.get_incremental_transformation(
        jnp.eye(4), levels, last_l2, cfg, CAM
    )
    rot_err, trans_err = pose_error(res.pose, T_true)
    assert trans_err < 2.5e-3, (trans_err, rot_err)
    assert rot_err < 4e-3
    assert float(res.icp_count) > 5000


def test_icp_only_mode():
    cfg = OdometryConfig(icp_weight=100.0, mask_icp=False, mask_rgb=False, so3_prealign=False)
    T_true = synthetic.pose((0.0, 0.01, 0.0), (0.005, 0.0, 0.0))
    levels, last_l2 = make_inputs(T_true, cfg)
    res = rgbd.get_incremental_transformation(jnp.eye(4), levels, last_l2, cfg, CAM)
    rot_err, trans_err = pose_error(res.pose, T_true)
    # ICP only: sphere + wall + floor constrain all 6 DoF weakly but should converge
    assert trans_err < 5e-3
    assert rot_err < 8e-3


def test_rgb_only_mode():
    cfg = OdometryConfig(rgb_only=True, mask_icp=False, mask_rgb=False)
    T_true = synthetic.pose((0.0, 0.0, 0.01), (0.004, 0.0, 0.0))
    levels, last_l2 = make_inputs(T_true, cfg)
    res = rgbd.get_incremental_transformation(jnp.eye(4), levels, last_l2, cfg, CAM)
    rot_err, trans_err = pose_error(res.pose, T_true)
    # photometric-only tracking is coarse by design: correspondences use
    # integer-rounded warps (reference residualKernel does the same), so only
    # expect convergence to within a couple of pixels' worth of motion
    assert trans_err < 0.02
    assert rot_err < 0.02


def test_identity_motion_stays_put():
    cfg = OdometryConfig(mask_icp=False, mask_rgb=False)
    levels, last_l2 = make_inputs(np.eye(4, dtype=np.float32), cfg)
    res = rgbd.get_incremental_transformation(jnp.eye(4), levels, last_l2, cfg, CAM)
    rot_err, trans_err = pose_error(res.pose, np.eye(4))
    assert trans_err < 5e-4
    assert rot_err < 1e-3


def test_divergence_guard():
    # huge implausible motion: guard must keep previous pose rather than jump >0.3m
    cfg = OdometryConfig(mask_icp=False, mask_rgb=False)
    T_true = synthetic.pose((0, 0, 0), (1.5, 0.0, 0.0))
    levels, last_l2 = make_inputs(T_true, cfg)
    res = rgbd.get_incremental_transformation(jnp.eye(4), levels, last_l2, cfg, CAM)
    _, trans_est = pose_error(res.pose, np.eye(4))
    assert trans_est <= 0.31  # either reverted (0) or small partial step


def test_stats_populated():
    cfg = OdometryConfig(mask_icp=False, mask_rgb=False, error_images=True)
    T_true = synthetic.pose((0, 0.01, 0), (0.005, 0, 0))
    levels, last_l2 = make_inputs(T_true, cfg)
    res = rgbd.get_incremental_transformation(jnp.eye(4), levels, last_l2, cfg, CAM)
    assert float(res.icp_count) > 0
    assert float(res.rgb_count) > 0
    assert np.all(np.isfinite(np.asarray(res.A)))
    # covariance invertible
    cov = np.linalg.inv(np.asarray(res.A))
    assert np.all(np.isfinite(cov))
    # error images written at level 0
    assert np.asarray(res.icp_error_image).shape == (CAM.height, CAM.width)
    assert float(jnp.max(res.icp_error_image)) > 0


def test_trunc_ldlt_matches_eigh_solver():
    """solve_trunc_ldlt == solve_preconditioned on healthy systems; both
    null out a degenerate direction instead of stepping along it."""
    import numpy as np

    from multimotionfusion_tpu.odometry.rgbd import (
        solve_preconditioned,
        solve_trunc_ldlt,
    )

    rs = np.random.RandomState(3)
    # healthy SPD systems with wildly different block scales (ICP vs RGB)
    for _ in range(20):
        m = rs.randn(6, 6)
        a = m @ m.T + 0.5 * np.eye(6)
        s = np.diag([1e3, 1e3, 1e3, 1.0, 1.0, 1.0])
        a = s @ a @ s
        b = s @ rs.randn(6)
        x0 = np.asarray(solve_preconditioned(jnp.asarray(a, jnp.float32),
                                             jnp.asarray(b, jnp.float32)))
        x1 = np.asarray(solve_trunc_ldlt(jnp.asarray(a, jnp.float32),
                                         jnp.asarray(b, jnp.float32)))
        ref = np.linalg.solve(a, b)
        assert np.allclose(x0, ref, rtol=2e-2, atol=1e-4), (x0, ref)
        assert np.allclose(x1, ref, rtol=2e-2, atol=1e-4), (x1, ref)

    # degenerate: a near-null direction must get ~zero step, not a huge one
    q, _ = np.linalg.qr(rs.randn(6, 6))
    w = np.array([5.0, 3.0, 2.0, 1.0, 0.5, 1e-7])
    a = (q * w) @ q.T
    b = q[:, -1] * 0.01 + q[:, 0] * 1.0  # junk along the null direction
    x0 = np.asarray(solve_preconditioned(jnp.asarray(a, jnp.float32),
                                         jnp.asarray(b, jnp.float32)))
    x1 = np.asarray(solve_trunc_ldlt(jnp.asarray(a, jnp.float32),
                                     jnp.asarray(b, jnp.float32)))
    # the truncated solvers stay bounded (the full solve would step ~1e5)
    assert np.linalg.norm(x0) < 10.0, x0
    assert np.linalg.norm(x1) < 10.0, x1

    # batched form matches the loop
    A = np.stack([a, np.eye(6, dtype=np.float64) * 2.0])
    B = np.stack([b, np.arange(6.0)])
    xb = np.asarray(solve_trunc_ldlt(jnp.asarray(A, jnp.float32),
                                     jnp.asarray(B, jnp.float32)))
    assert np.allclose(xb[1], np.arange(6.0) / 2.0, atol=1e-5), xb[1]
