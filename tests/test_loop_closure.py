"""Global loop closure: fern match -> deformation -> drift correction.

The synthetic journey the reference validates only manually (SURVEY.md §4):
build a map over several frames, inject a consistent pose+map drift (the
self-consistent error dense tracking cannot observe), then revisit the start.
The fern database still holds the TRUE early poses, so the loop closure must
(a) match, (b) relocalise the pose, (c) deform the map back, and (d) record a
PoseMatch. Ref: Core/MultiMotionFusion.cpp:679-789, Core/Model/Deformation.cpp:76-180.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from multimotionfusion_tpu.config import (
    CameraModel,
    DeformationConfig,
    EngineConfig,
    FernConfig,
    KeypointConfig,
    SurfelConfig,
)
from multimotionfusion_tpu.engine import MultiMotionFusionTPU
from multimotionfusion_tpu.io import synthetic
from multimotionfusion_tpu.io.frame import FrameData
from multimotionfusion_tpu.model import surfel_map as sm

CAM = CameraModel(width=80, height=60, fx=66.0, fy=66.0, cx=40.0, cy=30.0)


def _cfg():
    return EngineConfig(
        camera=CAM,
        enable_multi_model=False,
        odom_init="",
        close_loops=True,
        surfels=SurfelConfig(max_surfels=1 << 14, depth_cutoff=5.0, time_delta=3),
        keypoints=KeypointConfig(max_keypoints=64, max_tracks=256, track_history=8),
        ferns=FernConfig(num_ferns=200, factor=4),
        deformation=DeformationConfig(max_nodes=64, iterations=3),
        loop_accept_cons_err=0.02,
    )


def _drift(state, d):
    """Apply a rigid drift D to pose AND map (self-consistent error)."""
    D = jnp.asarray(d, jnp.float32)
    pose = D @ state.pose
    pos = state.smap.data[sm.POS]  # [3, cap]
    moved = D[:3, :3] @ pos + D[:3, 3:4]
    alive = state.smap.alive_mask()
    data = state.smap.data
    data = data.at[sm.POS].set(jnp.where(alive[None], moved, data[sm.POS]))
    return state._replace(
        pose=pose, prev_pose=D @ state.prev_pose,
        smap=sm.SurfelMap(data=data, count=state.smap.count),
    )


@pytest.mark.slow
def test_loop_closure_corrects_consistent_drift():
    cfg = _cfg()
    eng = MultiMotionFusionTPU(cfg)
    gt = []
    for i in range(6):
        T = synthetic.pose((0.0, 0.0015 * i, 0.0), (0.002 * i, 0.0, 0.0))
        gt.append(T)
        depth, rgb = synthetic.render(T, CAM)
        eng.process_frame(FrameData(rgb=rgb.astype(np.uint8), depth=depth, timestamp=i))
    eng.finish()

    # inject a 3 cm self-consistent drift
    D = np.eye(4, dtype=np.float32)
    D[:3, 3] = (0.03, -0.02, 0.01)
    eng.state = _drift(eng.state, D)
    pose_drifted = np.asarray(eng.state.pose)

    # revisit a start-like viewpoint (fern keyframes are older than time_delta)
    T_true = gt[0]
    depth, rgb = synthetic.render(T_true, CAM)
    eng.process_frame(
        FrameData(rgb=rgb.astype(np.uint8), depth=depth, timestamp=6)
    )
    eng.finish()

    matches = eng.pose_matches()
    assert matches, "no PoseMatch recorded"
    assert matches[-1]["accepted"], matches[-1]

    # pose snapped back towards truth
    err_before = np.linalg.norm((D @ T_true)[:3, 3] - T_true[:3, 3])
    err_after = np.linalg.norm(np.asarray(eng.state.pose)[:3, 3] - T_true[:3, 3])
    assert err_after < 0.4 * err_before, (err_after, err_before)
    # and it genuinely moved from the drifted estimate
    assert np.linalg.norm(np.asarray(eng.state.pose) - pose_drifted) > 0.01


@pytest.mark.slow
def test_no_spurious_loop_closures_without_drift():
    cfg = _cfg()
    eng = MultiMotionFusionTPU(cfg)
    for i in range(8):
        T = synthetic.pose((0.0, 0.001 * i, 0.0), (0.0015 * i, 0.0, 0.0))
        depth, rgb = synthetic.render(T, CAM)
        eng.process_frame(FrameData(rgb=rgb.astype(np.uint8), depth=depth, timestamp=i))
    eng.finish()
    # matches may fire on revisits, but any accepted one must be a no-op-sized
    # correction (the map is NOT wrecked by closing a loop on clean data)
    for m in eng.pose_matches():
        if m["accepted"]:
            assert m["mean_cons_err"] < 0.02
    # tracking stayed healthy
    stats = eng.current_stats()
    assert stats["icp_count"] > 100
