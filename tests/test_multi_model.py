"""Multi-model end-to-end: spawn on motion, lifecycle, map protection.

Synthetic scene: static camera, sphere translating through the scene. The
engine must spawn an object model from the flow-CRF outlier segment, keep the
mover's pixels out of the global model, track the object in its own slot, and
export its trajectory.

NOTE: object-tracking *accuracy* at this miniature test scale (40x30 CRF
grid, ~1 px/frame motion, weak patch descriptors) is scale-limited; accuracy
is pinned by the single-model ATE tests and, for objects, by real-sequence
evaluation. This test pins the multi-model MECHANISM.
"""

import numpy as np

from multimotionfusion_tpu.config import (
    CameraModel,
    EngineConfig,
    KeypointConfig,
    SegmentationConfig,
    SurfelConfig,
)
from multimotionfusion_tpu.engine import MultiMotionFusionTPU
from multimotionfusion_tpu.io.frame import FrameData
from tests import synthetic

CAM = CameraModel(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)


def _cfg():
    return EngineConfig(
        camera=CAM,
        enable_multi_model=True,
        odom_init="kp",
        object_slots=2,
        object_capacity=1 << 14,
        surfels=SurfelConfig(max_surfels=65536, depth_cutoff=5.0),
        keypoints=KeypointConfig(
            max_keypoints=256, max_tracks=1024, track_history=8,
            detector="patch", match_dist_gate=1.0,
        ),
        # CRF grid is 40x30 at this test scale; area gates scale down
        segmentation=SegmentationConfig(new_label_min_frac=0.02),
    )


def test_multi_model_spawn_lifecycle():
    step = np.array([0.015, 0.0, -0.01])
    frames = []
    movers = []
    for i in range(8):
        c = tuple(np.array([0.15, 0.0, 1.3]) + step * i)
        d, rgb = synthetic.render(
            np.eye(4, dtype=np.float32), CAM, sphere_center=c, sphere_radius=0.45
        )
        frames.append(
            FrameData(rgb=rgb.astype(np.uint8), depth=d, timestamp=int(i / 30 * 1e9))
        )
        movers.append(d)
    d_bg, _ = synthetic.render(np.eye(4, dtype=np.float32), CAM, sphere_radius=1e-9)

    engine = MultiMotionFusionTPU(_cfg())
    spawned_at = None
    active_frames = 0
    per_frame = []
    for i, f in enumerate(frames):
        engine.process_frame(f)
        if i >= 1:
            stats = engine.current_stats(sync=True)
            per_frame.append(stats)
            if spawned_at is None and stats.get("spawned", 0) > 0:
                spawned_at = i
            if stats.get("active_objects", 0) > 0:
                active_frames += 1
    engine.finish()

    # 1. a model spawns for the mover, exactly once (spawn cool-down)
    assert spawned_at is not None, "no object model was spawned"
    assert sum(s.get("spawned", 0) for s in per_frame) == 1
    # 2. the slot stays alive for several frames
    assert active_frames >= 3

    # 3. map protection: the mover's pixels must not be fused into the global
    # model — no global surfel may sit INSIDE the sphere's swept volume at a
    # late frame position (the sphere interior is free space for the wall map)
    cloud = engine.global_model.download()
    pos = cloud["position"]
    conf = cloud["confidence"]
    centre = np.array([0.15, 0.0, 1.3]) + step * 6
    inside = np.linalg.norm(pos - centre, axis=1) < 0.35  # well inside r=0.45
    # surfels from frame-0 fusion may persist with low confidence, but nothing
    # inside the late sphere position should have accumulated confidence
    assert conf[inside].max(initial=0.0) < 15.0

    # 4. camera stays bounded (mover pixels are excluded from its odometry).
    # The bound is loose because the drag is dominated by the PRE-spawn
    # frames at this miniature scale: the mover's ~1.8 cm/frame motion sits
    # under the sigma_depth (3 cm) and flow-ramp (0.2 px) gates, so the
    # first 2-3 frames fuse it into the global map and drag the camera
    # ~1.2 cm/frame before a model exists (measured; scale-limited physics,
    # not a mechanism failure — production-scale drag is pinned by the
    # 640x480 five-mover bench instead)
    cam_T = np.asarray(engine.mstate.pose)
    assert np.linalg.norm(cam_T[:3, 3]) < 0.11

    # 5. exports include the object trajectory
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        paths = engine.export_poses(d)
        names = [p.split("/")[-1] for p in paths]
        assert "poses-0.txt" in names
        assert any(n.startswith("poses-") and n != "poses-0.txt" for n in names)


def test_legacy_crf_mode_runs_end_to_end():
    """Engine-level smoke of the legacy CoFusion CRF segmentation mode
    (segm_mode 'crf' -> performSegmentationCRF path): the multi-model step
    must run with ICP-error unaries, produce a valid mask, and keep the
    global model tracking."""
    import dataclasses

    cfg = dataclasses.replace(
        _cfg(),
        segmentation=SegmentationConfig(mode="crf", new_label_min_frac=0.02),
    )
    assert cfg.segmentation.mode == "crf"
    frames = []
    step = np.array([0.02, 0.0, 0.0])
    for i in range(4):
        c = tuple(np.array([0.15, 0.0, 1.3]) + step * i)
        d, rgb = synthetic.render(
            np.eye(4, dtype=np.float32), CAM, sphere_center=c,
            sphere_radius=0.45,
        )
        frames.append(
            FrameData(rgb=rgb.astype(np.uint8), depth=d,
                      timestamp=int(i / 30 * 1e9))
        )
    engine = MultiMotionFusionTPU(cfg)
    assert engine.cfg.odometry.error_images  # implied by mode 'crf'
    for f in frames:
        engine.process_frame(f)
    stats = engine.finish()
    assert np.isfinite(stats["icp_error"])
    # the device-resident mask must be a valid label image
    mask = np.asarray(engine.mstate.prev_mask)
    assert mask.shape == (CAM.height, CAM.width)
    assert mask.min() >= 0 and mask.max() <= cfg.object_slots
