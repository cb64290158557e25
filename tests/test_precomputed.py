"""External-mask ("precomputed") segmentation path.

== reference Core/Segmentation/Segmentation.cpp:89-147: user-supplied mask
images map ids to models and drive spawning; no CRF runs. End-to-end through
ImageLogReader (Color/Depth/Mask pngs) and the multi-model engine.
"""

import dataclasses
import os

import numpy as np
import pytest

from multimotionfusion_tpu.config import (
    CameraModel,
    EngineConfig,
    KeypointConfig,
    RansacConfig,
    SegmentationConfig,
    SurfelConfig,
)
from multimotionfusion_tpu.engine import MultiMotionFusionTPU
from multimotionfusion_tpu.io import synthetic
from multimotionfusion_tpu.io.readers import ImageLogReader

CAM = CameraModel(width=80, height=60, fx=66.0, fy=66.0, cx=40.0, cy=30.0)


def _cfg(slots=3):
    return EngineConfig(
        camera=CAM,
        enable_multi_model=True,
        object_slots=slots,
        object_capacity=2048,
        odom_init="",
        surfels=SurfelConfig(max_surfels=1 << 13, depth_cutoff=5.0),
        keypoints=KeypointConfig(max_keypoints=64, max_tracks=256, track_history=8),
        ransac=RansacConfig(iterations=32),
        segmentation=SegmentationConfig(mode="precomputed", min_mask_size_px=40),
        model_spawn_offset=1,
        model_unseen_patience=2,
        upload_yuv420=False,
        upload_depth_mm=False,
    )


def _mask(frame_i: int) -> np.ndarray:
    """Two external ids (7, 3); id 3 vanishes after frame 5."""
    m = np.zeros((CAM.height, CAM.width), np.uint8)
    m[10:25, 10:30] = 7
    if frame_i < 5:
        m[35:50, 50:70] = 3
    return m


def _write_log(tmpdir) -> str:
    import cv2

    for i in range(8):
        T = synthetic.pose((0.0, 0.001 * i, 0.0), (0.0015 * i, 0.0, 0.0))
        depth, rgb = synthetic.render(T, CAM)
        cv2.imwrite(
            os.path.join(tmpdir, f"Color{i:04d}.png"),
            rgb.astype(np.uint8)[..., ::-1],
        )
        d16 = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(tmpdir, f"Depth{i:04d}.png"), d16)
        cv2.imwrite(os.path.join(tmpdir, f"Mask{i:04d}.png"), _mask(i))
    return tmpdir


def test_external_masks_drive_spawning_and_lifecycle(tmp_path):
    d = _write_log(str(tmp_path))
    reader = ImageLogReader(d)
    assert len(reader) == 8
    eng = MultiMotionFusionTPU(_cfg())
    active_per_frame = []
    for f in reader:
        assert f.mask is not None
        eng.process_frame(f)
        stats = eng.finish()
        active_per_frame.append(stats.get("active_objects", 0.0))

    # both external ids spawned models (one per frame given the cool-down)
    assert max(active_per_frame) == 2.0, active_per_frame
    # id 3 vanished at frame 5 -> its model deactivates after patience
    assert active_per_frame[-1] == 1.0, active_per_frame

    # the surviving slot owns external id 7
    ext = np.asarray(eng.mstate.objects.ext_id)
    act = np.asarray(eng.mstate.objects.active)
    assert set(ext[act]) == {7}
    # the vanished model retained its id for reactivation
    assert 3 in set(ext[~act])


def test_mask_reappearance_reactivates_same_slot(tmp_path):
    import cv2

    for i in range(10):
        T = synthetic.pose((0.0, 0.001 * i, 0.0), (0.0015 * i, 0.0, 0.0))
        depth, rgb = synthetic.render(T, CAM)
        cv2.imwrite(
            os.path.join(str(tmp_path), f"Color{i:04d}.png"),
            rgb.astype(np.uint8)[..., ::-1],
        )
        cv2.imwrite(
            os.path.join(str(tmp_path), f"Depth{i:04d}.png"),
            np.clip(depth * 1000.0, 0, 65535).astype(np.uint16),
        )
        m = np.zeros((CAM.height, CAM.width), np.uint8)
        if i < 4 or i >= 7:  # id present, gone, back
            m[10:25, 10:30] = 7
        cv2.imwrite(os.path.join(str(tmp_path), f"Mask{i:04d}.png"), m)

    eng = MultiMotionFusionTPU(_cfg())
    history = []
    for f in ImageLogReader(str(tmp_path)):
        eng.process_frame(f)
        s = eng.finish()
        history.append(s.get("active_objects", 0.0))
    # went active -> inactive -> active again, without consuming a second slot
    assert max(history[:5]) == 1.0
    assert min(history[5:7]) == 0.0
    assert history[-1] == 1.0
    ext = np.asarray(eng.mstate.objects.ext_id)
    assert list(ext).count(7) == 1
