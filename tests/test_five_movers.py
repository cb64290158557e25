"""Five concurrent object models: the BASELINE.md north-star configuration.

The reference sustains up to 256 simultaneous models (getNextModelID,
MultiMotionFusion.cpp:983-999); the baseline target is >= 5 objects at 30 FPS.
This journey pins the CORRECTNESS half of that claim end-to-end: five
independent movers spawn organically (staggered by the spawn cool-down,
largest-outlier-first — the reference spawns at most one model per frame
too), hold five distinct slots simultaneously, partition the mask, and track
opposing motions; one mover vanishes and is deactivated on schedule while
the other four stay active.
"""

import dataclasses

import numpy as np
import pytest

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

pytestmark = pytest.mark.slow

CAM = CameraModel(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)


def _cfg():
    return EngineConfig(
        camera=CAM,
        enable_multi_model=True,
        odom_init="kp",
        object_slots=5,
        object_capacity=1 << 13,
        model_spawn_offset=2,
        surfels=SurfelConfig(max_surfels=65536, depth_cutoff=5.0),
        keypoints=KeypointConfig(
            max_keypoints=256, max_tracks=1024, track_history=8,
            detector="patch", match_dist_gate=1.0,
        ),
        segmentation=SegmentationConfig(new_label_min_frac=0.01),
    )


# five spheres spread across the view; radii small enough not to merge
_CENTRES = [
    np.array([-0.55, -0.15, 1.55]),
    np.array([0.55, -0.15, 1.55]),
    np.array([-0.35, 0.35, 1.5]),
    np.array([0.35, 0.35, 1.5]),
    np.array([0.0, -0.4, 1.6]),
]
_RADIUS = 0.21
# tangential velocities after the approach phase (opposing directions)
_VEL = [
    np.array([0.02, 0.0, 0.0]),
    np.array([-0.02, 0.0, 0.0]),
    np.array([0.015, 0.0, 0.0]),
    np.array([-0.015, 0.0, 0.0]),
    np.array([0.0, -0.015, 0.0]),
]
_APPROACH = np.array([0.0, 0.0, -0.04])
_N_APPROACH = 4
_N_TANGENT = 12


def _frames(drop_last_after: int | None = None):
    """Render the journey; mover 4 vanishes after frame `drop_last_after`."""
    cs = [c.copy() for c in _CENTRES]
    frames = []
    n = 1 + _N_APPROACH + _N_TANGENT
    for i in range(n):
        spheres = [(tuple(c), _RADIUS) for c in cs]
        if drop_last_after is not None and i > drop_last_after:
            spheres = spheres[:-1]
        d, rgb = synthetic.render(
            np.eye(4, dtype=np.float32), CAM, spheres=spheres
        )
        frames.append(
            FrameData(rgb=rgb.astype(np.uint8), depth=d,
                      timestamp=int(i / 30 * 1e9))
        )
        for k in range(5):
            step = _APPROACH if i < _N_APPROACH else _VEL[k]
            cs[k] = cs[k] + step
    return frames


def test_five_movers_spawn_and_track():
    frames = _frames()
    engine = MultiMotionFusionTPU(_cfg())
    spawn_frames = {}
    active_per_frame = []
    for i, f in enumerate(frames):
        engine.process_frame(f)
        act = np.asarray(engine.mstate.objects.active)
        active_per_frame.append(int(act.sum()))
        for k in np.nonzero(act)[0]:
            spawn_frames.setdefault(int(k), i)
    engine.finish()

    # all five slots spawned, staggered by the cool-down (organic spawning:
    # one largest-outlier label per frame, >= spawn_offset apart)
    assert len(spawn_frames) == 5, spawn_frames
    ticks = sorted(spawn_frames.values())
    assert all(b - a >= 2 for a, b in zip(ticks, ticks[1:])), ticks

    # all five simultaneously active at the end
    act = np.asarray(engine.mstate.objects.active)
    assert act.sum() == 5, act
    # sustained: at least the last 3 frames had all five active
    assert all(a == 5 for a in active_per_frame[-3:]), active_per_frame

    # the final mask carries five distinct object labels with real support
    m = np.asarray(engine.mstate.prev_mask)
    for mid in range(1, 6):
        assert (m == mid).sum() > 120, (mid, (m == mid).sum())

    # opposing tangential motions: compare the two clean late spawns' world
    # x-velocities by slot-centre association. World motion = inv(slot_pose)
    # for a static camera (exportPoses composition).
    poses = {k: [] for k in range(5)}
    engine._expand_lifecycle_logs()
    for _, p, a_ in engine._obj_pose_dev:
        a_ = np.asarray(a_)
        for k in range(5):
            if a_[k]:
                poses[k].append(np.linalg.inv(np.asarray(p)[k])[:3, 3])
    # associate each slot with a mover via the mask centroid direction:
    # instead, just check that among the five totals there are both clearly
    # +x and clearly -x motions and none exceeds the physical envelope
    totals = np.stack([poses[k][-1] - poses[k][0] for k in range(5)])
    assert (totals[:, 0] > 0.03).sum() >= 1, totals
    assert (totals[:, 0] < -0.03).sum() >= 1, totals
    assert np.abs(totals).max() < 0.45, totals

    # the static camera is not dragged by five movers covering much of view
    cam_t = np.asarray(engine.mstate.pose)[:3, 3]
    assert np.linalg.norm(cam_t) < 0.08, cam_t

    # exports: global + five object trajectories
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        names = [p.split("/")[-1] for p in engine.export_poses(d)]
        assert "poses-0.txt" in names
        assert sum(1 for n in names if n != "poses-0.txt") >= 5, names


def test_five_movers_one_vanishes():
    """Mover 4 disappears mid-journey: its slot must deactivate after the
    unseen patience while the other four stay active (lost-model
    bookkeeping, MultiMotionFusion.cpp:606-613)."""
    cfg = _cfg()
    frames = _frames(drop_last_after=10)
    engine = MultiMotionFusionTPU(cfg)
    for f in frames:
        engine.process_frame(f)
    engine.finish()
    act = np.asarray(engine.mstate.objects.active)
    assert act.sum() == 4, act
