"""Accuracy evidence: long journeys, object-trajectory ATE, golden anchors.

The reference's evaluation protocol replays recorded sequences and reports
ATE against ground truth (README.md:204-233). Real MMF bags don't exist in
this environment, so these tests run longer, harder synthetic journeys with
analytically known trajectories:

- 120-frame camera journey (translation + rotation), camera ATE tightened an
  order of magnitude below the 20%-of-motion smoke gate in test_end_to_end;
- golden-trajectory regression against a committed anchor, so silent accuracy
  drift between rounds fails loudly;
- object-trajectory accuracy in multi-model mode: the estimated world motion
  of a spawned object model must match the mover's analytic motion per frame
  (this pins the object-pose composition convention, engine_multi.py:19-21:
  world motion = inv(slot_pose) for a static camera).
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
from multimotionfusion_tpu.io.readers import SyntheticLogReader
from tests import synthetic

CAM = CameraModel(width=80, height=60, fx=66.0, fy=66.0, cx=40.0, cy=30.0)
OBJ_CAM = CameraModel(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)

pytestmark = pytest.mark.slow


def _journey(n=120):
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
    return est, gt


def test_long_journey_ate_and_golden():
    """120 frames, 0.48 m path with continuous yaw: ATE must stay below 2.5%
    of the path length (measured ~0.8%) and rotation below 1 degree; the
    whole trajectory must match the committed golden anchor."""
    est, gt = _journey()
    err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=-1)
    ate = np.sqrt(np.mean(err**2))
    path = np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=-1))
    assert ate < 0.025 * path, (ate, path)

    rot_err = [
        np.degrees(np.arccos(np.clip(
            (np.trace(est[i, :3, :3].T @ gt[i, :3, :3]) - 1) / 2, -1, 1)))
        for i in range(len(est))
    ]
    assert max(rot_err) < 1.0, max(rot_err)

    # regression anchor: recorded from this same scenario; loud failure beats
    # silent accuracy drift. Tolerance covers cross-version numeric jitter,
    # not behaviour change (1 mm / ~0.06 deg).
    golden = np.load("tests/data/golden_journey_120.npy")
    assert est.shape == golden.shape
    dt = np.linalg.norm(est[:, :3, 3] - golden[:, :3, 3], axis=-1)
    assert dt.max() < 1e-3, dt.max()


def _obj_cfg(patience=None):
    cfg = EngineConfig(
        camera=OBJ_CAM, enable_multi_model=True, odom_init="kp",
        object_slots=2, object_capacity=1 << 14,
        surfels=SurfelConfig(max_surfels=65536, depth_cutoff=5.0),
        keypoints=KeypointConfig(
            max_keypoints=256, max_tracks=1024, track_history=8,
            detector="patch", match_dist_gate=1.0,
        ),
        segmentation=SegmentationConfig(new_label_min_frac=0.02),
    )
    if patience is not None:
        cfg = dataclasses.replace(cfg, model_unseen_patience=patience)
    return cfg


def _mover_frames(steps, c0=(0.15, 0.0, 1.42), radius=0.45):
    """Frames of a sphere following per-frame `steps` from `c0` (static cam)."""
    centers = [np.asarray(c0, np.float64)]
    for s in steps:
        centers.append(centers[-1] + np.asarray(s))
    frames = []
    for i, c in enumerate(centers):
        d, rgb = synthetic.render(
            np.eye(4, dtype=np.float32), OBJ_CAM, sphere_center=tuple(c),
            sphere_radius=radius,
        )
        frames.append(FrameData(rgb=rgb.astype(np.uint8), depth=d,
                                timestamp=int(i / 30 * 1e9)))
    return frames


# an approach phase triggers a prompt spawn through the reprojection term
# (interior depth misfit 4 cm/frame > sigma_depth, ramp-independent); the
# tangential phase then measures tracking of the claimed object. A PURELY
# tangential slow mover (~2 px/frame) is sub-threshold by the reference's own
# flow-magnitude ramp (Segmentation.cpp:1195-1197) and would not spawn there
# either.
_APPROACH = [np.array([0.0, 0.0, -0.04])] * 3
_TANGENT = [np.array([0.02, 0.0, 0.0])] * 6


def _object_world_deltas(engine):
    """Per-frame world-frame translation deltas of the first active slot.

    Static camera => object world motion = inv(slot_pose) (the composition
    convention documented at engine_multi.py:19-21 / exportPoses)."""
    deltas, prev = [], None
    for _, poses, active in engine._obj_pose_dev:
        act = np.asarray(active)
        if act.any():
            k = int(np.nonzero(act)[0][0])
            d_w = np.linalg.inv(np.asarray(poses)[k])[:3, 3]
            if prev is not None:
                deltas.append(d_w - prev)
            prev = d_w
        else:
            prev = None
    return np.asarray(deltas)


def test_object_trajectory_tracks_motion():
    """Approach (4 cm/frame toward the camera) then tangential translation
    (2 cm/frame): once spawned, the object model's estimated per-frame world
    motion must match the analytic motion. Before round 2 this failed
    structurally — segmentation compared the frame against predictions at
    LAST frame's poses, so a mover never fit its own model, froze, and was
    deactivated after 3 frames. Tolerances reflect the physics: the depth
    axis is pinned by ICP (sub-mm), the tangential axes of a sphere are
    per-frame ambiguous but unbiased (measured mean error 0.5%)."""
    steps = _APPROACH + _TANGENT
    frames = _mover_frames(steps)
    engine = MultiMotionFusionTPU(_obj_cfg())
    for f in frames:
        engine.process_frame(f)
    engine.finish()

    # spawned on the first moving frame; active to the end (no deactivation)
    assert bool(np.asarray(engine.mstate.objects.active)[0])
    deltas = _object_world_deltas(engine)
    assert len(deltas) == len(steps) - 1, f"tracked {len(deltas)} steps"

    # per-frame tangential estimates of a SPHERE are ambiguous (zero-mean
    # wobble up to a couple of cm at this miniature scale — the geometric
    # term cannot pin motion tangent to the surface); the trajectory-level
    # quantities are what the reference's evaluation protocol scores, and
    # they are tight: measured total-displacement error ~1%.
    total = deltas.sum(axis=0)
    gt_total = np.sum(steps[1:], axis=0)  # first delta spans two frames
    cos = total @ gt_total / (
        np.linalg.norm(total) * np.linalg.norm(gt_total) + 1e-12
    )
    assert cos > 0.9, (total, gt_total)
    ratio = np.linalg.norm(total) / np.linalg.norm(gt_total)
    assert 0.75 < ratio < 1.25, (total, gt_total)
    # the depth axis IS pinned per frame once the model settles: the last
    # three tangential frames must hold z still to a few mm
    assert np.abs(deltas[-3:, 2]).max() < 5e-3, deltas[-3:]
    # the static camera must not be dragged by the mover. Loose bound: the
    # drag is dominated by the 2-3 PRE-spawn frames, whose ~2 cm/frame mover
    # motion sits at the sigma_depth/flow-ramp noise floor of this miniature
    # scale and fuses into the global map before a model exists (see
    # test_multi_model.py's matching note; production-scale drag is pinned
    # by the 640x480 five-mover bench)
    cam_t = np.asarray(engine.mstate.pose)[:3, 3]
    assert np.linalg.norm(cam_t) < 0.09, cam_t


def test_two_objects_track_opposing_motions():
    """TWO independent movers (opposing tangential motions after an approach
    phase): both must spawn (second one after the spawn cool-down), hold
    their own slots to the end, and track their opposing world motions with
    the right directions and magnitudes. This pins simultaneous multi-object
    capacity end-to-end (the BASELINE configuration is >= 5 objects; slot
    count is a config scalar and test_parallel exercises 8 sharded slots —
    what needs evidence is several CONCURRENT spawn/track lifecycles)."""
    cfg = dataclasses.replace(_obj_cfg(), model_spawn_offset=2)
    cA = np.array([-0.25, 0.0, 1.45])
    cB = np.array([0.42, 0.05, 1.5])
    stepsA = [np.array([0.0, 0.0, -0.045])] * 3 + [np.array([0.02, 0, 0])] * 6
    stepsB = [np.array([0.0, 0.0, -0.045])] * 3 + [np.array([-0.02, 0, 0])] * 6
    frames = []
    a, b = cA.copy(), cB.copy()
    for i in range(len(stepsA) + 1):
        d, rgb = synthetic.render(
            np.eye(4, dtype=np.float32), OBJ_CAM,
            spheres=[(tuple(a), 0.3), (tuple(b), 0.28)],
        )
        frames.append(FrameData(rgb=rgb.astype(np.uint8), depth=d,
                                timestamp=int(i / 30 * 1e9)))
        if i < len(stepsA):
            a = a + stepsA[i]
            b = b + stepsB[i]

    engine = MultiMotionFusionTPU(cfg)
    spawn_frames = {}
    for i, f in enumerate(frames):
        engine.process_frame(f)
        act = np.asarray(engine.mstate.objects.active)
        for k in np.nonzero(act)[0]:
            spawn_frames.setdefault(int(k), i)
    engine.finish()

    act = np.asarray(engine.mstate.objects.active)
    assert act[0] and act[1], f"both slots must stay active, got {act}"
    assert len(spawn_frames) == 2
    # the mask carries BOTH objects simultaneously on the final frame
    m = np.asarray(engine.mstate.prev_mask)
    assert (m == 1).sum() > 500 and (m == 2).sum() > 500

    # world trajectories per slot (static camera): inv(slot_pose)
    poses = {k: [] for k in (0, 1)}
    for _, p, a_ in engine._obj_pose_dev:
        a_ = np.asarray(a_)
        for k in (0, 1):
            if a_[k]:
                poses[k].append(np.linalg.inv(np.asarray(p)[k])[:3, 3])
    totals = {k: poses[k][-1] - poses[k][0] for k in (0, 1)}
    # associate slots to movers by tangential direction (spawn ORDER between
    # two similar segments is a segmentation-internals detail; which mover
    # each slot tracked is what matters): A moved +x, B moved -x
    ks = sorted(totals, key=lambda k: totals[k][0])
    tB, tA = totals[ks[0]], totals[ks[1]]
    # opposing x directions is the headline multi-object property
    assert tA[0] > 0.04 and tB[0] < -0.04, (tA, tB)
    # magnitudes within the physical envelope (each mover travelled 0.12 in
    # x; the slot that also saw the approach carries z too)
    assert abs(tA[0] - 0.12) < 0.09, tA
    assert abs(tB[0] + 0.12) < 0.09, tB
    assert min(tA[2], tB[2]) > -0.16 and max(tA[2], tB[2]) < 0.03, (tA, tB)
    # camera ends near the origin despite two movers covering ~35% of view
    cam_t = np.asarray(engine.mstate.pose)[:3, 3]
    assert np.linalg.norm(cam_t) < 0.06, cam_t
    # exports cover the global trajectory + both objects
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        names = [p.split("/")[-1] for p in engine.export_poses(d)]
        assert "poses-0.txt" in names and len(names) >= 3


def test_unseen_patience_deactivates_on_schedule():
    """A tracked mover that vanishes must be deactivated after EXACTLY
    `model_unseen_patience` zero-pixel frames (deviation pin: the reference
    deactivates after ONE unseen frame, MultiMotionFusion.cpp:606-613; this
    engine defaults to 3 — config.py model_unseen_patience — to survive
    single-frame CRF flicker; patience is configurable down to the
    reference's behaviour)."""
    steps = _APPROACH + _TANGENT[:2]
    moving = _mover_frames(steps)
    # after the last mover frame the sphere disappears entirely
    d_bg, rgb_bg = synthetic.render(
        np.eye(4, dtype=np.float32), OBJ_CAM, sphere_radius=1e-9
    )
    n_mov = len(moving)
    gone = [
        FrameData(rgb=rgb_bg.astype(np.uint8), depth=d_bg,
                  timestamp=int((n_mov + j) / 30 * 1e9))
        for j in range(5)
    ]
    patience = 3
    engine = MultiMotionFusionTPU(_obj_cfg(patience=patience))
    active_log = []
    for f in moving + gone:
        engine.process_frame(f)
        active_log.append(bool(np.asarray(engine.mstate.objects.active)[0]))
    engine.finish()
    last = n_mov - 1
    assert active_log[last], "model should be active on the last mover frame"
    # the slot survives exactly `patience` empty frames, then deactivates
    assert active_log[last + patience - 1]
    assert not active_log[last + patience]
    # and it is stored for redetection (Model::store on deactivation)
    assert bool(np.asarray(engine.mstate.objects.stored)[0])
