"""Batched multi-model dispatch (multi_frame_steps_batch).

The batched path scans k full multi-model frames inside one executable
(engine_multi.multi_frame_steps_batch) to amortise per-dispatch host
round-trips — the multi-model analogue of the static-mode _frame_steps_batch.
It must be bit-for-bit the same computation as k sequential multi_frame_step
calls (the step takes no per-frame host input outside precomputed-mask mode),
and the engine wrapper must keep its lifecycle logs (object poses, spawn
records, events, exports) working over batched records.
"""

import numpy as np
import jax
import jax.numpy as jnp

from multimotionfusion_tpu import engine_multi as em
from multimotionfusion_tpu.engine import MultiMotionFusionTPU
from multimotionfusion_tpu.io.frame import FrameData
from multimotionfusion_tpu.parallel import dryrun


def test_batched_step_matches_sequential():
    """Device-level equality: scan-of-k == k single steps (tiny shapes)."""
    cfg = dryrun.tiny_config(n_slots=2)
    eng, state, rgb2, depth2 = dryrun.build_state(cfg)
    cam = cfg.camera
    bucket = cfg.surfels.max_surfels
    k = 3
    rgbs = jnp.stack([jnp.asarray(rgb2)] * k)
    depths = jnp.stack([jnp.asarray(depth2)] * k)

    (st_b, stats_b, poses_b, obj_poses_b, obj_active_b, spawns_b, _, _,
     masks_b) = (
        em.multi_frame_steps_batch(
            state, rgbs, depths, None, 2, 1.0, eng.sp_params, cam, cfg, bucket
        )
    )
    jax.block_until_ready(st_b.pose)

    st_s = state
    seq_stats, seq_poses = [], []
    for i in range(k):
        st_s, s, _, _ = em.multi_frame_step(
            st_s, rgbs[i], depths[i], None, 2 + i, 1.0, eng.sp_params,
            cam, cfg, bucket,
        )
        seq_stats.append(np.asarray(s))
        seq_poses.append(np.asarray(st_s.pose))

    np.testing.assert_allclose(
        np.asarray(st_b.pose), np.asarray(st_s.pose), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(st_b.objects.pose), np.asarray(st_s.objects.pose), atol=1e-5
    )
    assert np.array_equal(
        np.asarray(st_b.objects.active), np.asarray(st_s.objects.active)
    )
    for i in range(k):
        np.testing.assert_allclose(
            np.asarray(stats_b[i]), seq_stats[i], atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(poses_b[i]), seq_poses[i], atol=1e-5)


def test_engine_batched_multi_lifecycle(tmp_path):
    """Engine-level wiring: process_frames in multi-model mode takes the
    batched path, and the batched lifecycle records still drive spawn events,
    back-dated trajectories and pose exports (engine._expand_lifecycle_logs).
    """
    from tests.test_multi_model import CAM, _cfg
    from tests import synthetic

    step = np.array([0.015, 0.0, -0.01])
    frames = []
    for i in range(9):
        c = tuple(np.array([0.15, 0.0, 1.3]) + step * i)
        d, rgb = synthetic.render(
            np.eye(4, dtype=np.float32), CAM, sphere_center=c, sphere_radius=0.45
        )
        frames.append(
            FrameData(rgb=rgb.astype(np.uint8), depth=d, timestamp=int(i / 30 * 1e9))
        )

    engine = MultiMotionFusionTPU(_cfg())
    engine.process_frame(frames[0])
    for i in range(1, len(frames), 4):
        engine.process_frames(frames[i : i + 4])
    engine.finish()
    assert engine.tick == len(frames) + 1

    # batched records were appended (ts is a list), then expand on demand
    assert any(isinstance(e[0], list) for e in engine._obj_pose_dev)
    events = engine.drain_events()
    assert any(ev["event"] == "new_model" for ev in events)
    assert all(not isinstance(e[0], list) for e in engine._obj_pose_dev)

    stats = engine.current_stats(sync=True)
    assert stats["active_objects"] >= 1

    paths = engine.export_poses(str(tmp_path))
    names = [p.split("/")[-1] for p in paths]
    assert "poses-0.txt" in names
    assert any(n.startswith("poses-") and n != "poses-0.txt" for n in names)
    # camera log covers every frame exactly once despite batched appends
    with open(tmp_path / "poses-0.txt") as f:
        assert len(f.readlines()) == len(frames)
