"""Relocalisation mode: tracking-lost detection + fern recovery.

Scenario: normal tracking builds the fern database, a sensor blackout makes
tracking fail for > 10 frames (covariance blows up), then the camera reappears
at a previously seen pose — the engine must flag `lost` and recover the pose
from the fern database (reference reloc mode '-rl',
MultiMotionFusion.cpp:629-695).
"""

import numpy as np

from multimotionfusion_tpu.config import (
    CameraModel,
    EngineConfig,
    FernConfig,
    SurfelConfig,
)
from multimotionfusion_tpu.engine import MultiMotionFusionTPU
from multimotionfusion_tpu.io.frame import FrameData
from tests import synthetic

CAM = CameraModel(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)


def test_lost_and_relocalise():
    cfg = EngineConfig(
        camera=CAM,
        enable_multi_model=False,
        odom_init="",
        reloc_mode=True,
        surfels=SurfelConfig(max_surfels=65536, depth_cutoff=5.0),
        ferns=FernConfig(num_ferns=300, factor=4, max_depth=5.0),
    )
    engine = MultiMotionFusionTPU(cfg)

    poses = [synthetic.pose((0, 0.04 * i, 0), (0.06 * i, 0, 0)) for i in range(4)]
    for i, T in enumerate(poses):
        d, rgb = synthetic.render(T, CAM)
        engine.process_frame(
            FrameData(rgb=rgb.astype(np.uint8), depth=d, timestamp=i)
        )
    assert not bool(engine.state.lost)
    assert int(engine.state.ferns.count) >= 2  # distinct views inserted

    # blackout: invalid depth + black images -> no correspondences
    black = FrameData(
        rgb=np.zeros((CAM.height, CAM.width, 3), np.uint8),
        depth=np.zeros((CAM.height, CAM.width), np.float32),
        timestamp=99,
    )
    for i in range(13):
        engine.process_frame(black)
    assert bool(engine.state.lost), int(engine.state.bad_track_count)

    # reappear near pose 1: fern retrieval + alignment must recover
    T_true = synthetic.pose((0, 0.04 + 0.01, 0), (0.06 + 0.01, 0, 0))
    d, rgb = synthetic.render(T_true, CAM)
    engine.process_frame(
        FrameData(rgb=rgb.astype(np.uint8), depth=d, timestamp=100)
    )
    engine.finish()
    assert not bool(engine.state.lost), "relocalisation did not recover"
    T_est = np.asarray(engine.state.pose)
    delta = np.linalg.inv(T_true) @ T_est
    # recovered to within the fern resolution's accuracy (see test_ferns)
    assert np.linalg.norm(delta[:3, 3]) < 0.06
