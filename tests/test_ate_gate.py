"""Fast-suite ATE gate: every round's default test run checks accuracy.

The full accuracy battery (tests/test_accuracy.py) is marked `slow` and a
regression can hide behind that marker for a whole round (it did: two
five-mover lifecycle asserts drifted unnoticed across a host change). This
single 48-frame journey at the 80x60 miniature scale keeps a HARD camera-ATE
bound in the `not slow` set. The bound (2x the slow suite's 2.5%-of-path,
margin for the shorter path's worse SNR) fails if camera tracking degrades by
~2x — the regression size that matters — while staying insensitive to
run-to-run jitter (measured ~0.8% of path on a healthy build).
"""

import numpy as np

from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
from multimotionfusion_tpu.engine import MultiMotionFusionTPU
from multimotionfusion_tpu.io.readers import SyntheticLogReader

CAM = CameraModel(width=80, height=60, fx=66.0, fy=66.0, cx=40.0, cy=30.0)


def test_short_journey_camera_ate():
    n = 48
    cfg = EngineConfig(
        camera=CAM, enable_multi_model=False, odom_init="",
        surfels=SurfelConfig(max_surfels=65536, depth_cutoff=5.0),
    )
    reader = SyntheticLogReader(
        CAM, num_frames=n, cam_step=(0.004, 0.0, 0.0),
        cam_rot_step=(0.0, 0.002, 0.0),
    )
    frames = list(reader)
    engine = MultiMotionFusionTPU(cfg)
    engine.process_frame(frames[0])
    for i in range(1, n, 10):
        engine.process_frames(frames[i : i + 10])
    engine.finish()
    est = np.stack([p for _, p in engine.global_model.pose_log])
    gt = np.stack(reader.gt_poses)

    err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=-1)
    ate = np.sqrt(np.mean(err**2))
    path = np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=-1))
    assert ate < 0.05 * path, (ate, path)

    rot_err = [
        np.degrees(np.arccos(np.clip(
            (np.trace(est[i, :3, :3].T @ gt[i, :3, :3]) - 1) / 2, -1, 1)))
        for i in range(len(est))
    ]
    assert max(rot_err) < 1.5, max(rot_err)
