"""Unit test for the COMPOSITE multi-model GN solver, seed-free.

Round-5 regression lesson: the multi-model journeys run with keypoint seeds
('-init kp'), and the RANSAC seeds are good enough at miniature scale to
mask a completely broken dense term (a transform-packing bug in
_per_owner_transform zeroed the dense refinement's value and the lifecycle
tests still mostly passed). This test drives
odometry.multi.multi_incremental_transformation DIRECTLY — no seeds, two
owner partitions — so the dense composite solve itself must recover the
motion.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from multimotionfusion_tpu.config import CameraModel, OdometryConfig
from multimotionfusion_tpu.odometry import multi as modo
from multimotionfusion_tpu.odometry.levels import (
    build_frame_pyramids,
    build_level_data,
)
from multimotionfusion_tpu.ops import image as imops, maps as mapops
from tests import synthetic

CAM = CameraModel(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)


@pytest.mark.parametrize(
    "rotvec,trans",
    [((0.0, 0.004, 0.0), (0.006, 0.0, 0.0)),
     ((0.003, 0.0, 0.002), (0.0, -0.005, 0.002))],
)
def test_composite_solver_recovers_motion_both_partitions(rotvec, trans):
    """Split the image between two 'models' of the SAME static scene; both
    partitions must independently recover the camera motion without seeds."""
    import dataclasses

    # mask_icp off, as the composite engine configures it (engine_multi
    # builds ONE level set for all models; ownership gating happens through
    # the one-hot rows, not by pre-masking the vmaps)
    cfg = dataclasses.replace(OdometryConfig(), mask_icp=False)
    T = synthetic.pose(rotvec, trans)
    depth_a, rgb_a = synthetic.render(np.eye(4, dtype=np.float32), CAM)
    depth_b, rgb_b = synthetic.render(T, CAM)

    # owner mask: left half -> model 0, right half -> model 1
    own = jnp.concatenate(
        [
            jnp.zeros((CAM.height, CAM.width // 2), jnp.int32),
            jnp.ones((CAM.height, CAM.width // 2), jnp.int32),
        ],
        axis=1,
    )
    frame = build_frame_pyramids(
        jnp.asarray(depth_b), jnp.asarray(rgb_b), own, cfg
    )
    pred_vmap = mapops.create_vmap(jnp.asarray(depth_a), CAM, 5.0)
    pred_nmap = mapops.create_nmap(pred_vmap)
    pred_int = imops.rgb_to_intensity(jnp.asarray(rgb_a))
    levels = build_level_data(frame, pred_vmap, pred_nmap, pred_int, CAM, cfg)
    last_l2 = imops.build_pyramid(pred_int, cfg.num_pyr)[cfg.num_pyr - 1]

    T_prev = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (2, 4, 4))
    res = modo.multi_incremental_transformation(
        T_prev, levels, last_l2, cfg, CAM, 2, pred_own=own
    )
    # both models' poses = T_prev @ inv(increment); ground truth camera pose
    # after the motion is T (camera-to-world of frame b)
    for m in range(2):
        est = np.asarray(res.poses[m])
        gt = np.asarray(T)
        t_err = np.linalg.norm(est[:3, 3] - gt[:3, 3])
        r_err = np.degrees(
            np.arccos(np.clip((np.trace(est[:3, :3].T @ gt[:3, :3]) - 1) / 2,
                              -1, 1))
        )
        # dense-only convergence at miniature scale: within a third of the
        # motion magnitude and a tenth of a degree
        assert t_err < 0.0035, (m, est[:3, 3], gt[:3, 3])
        assert r_err < 0.15, (m, r_err)
        assert float(res.icp_count[m]) > 1000, res.icp_count
