"""End-to-end static-mode slice: reader -> engine -> tracking -> exports.

The regression anchor from SURVEY.md §7 stage 3: a single static model
(ElasticFusion mode) tracks and fuses a synthetic log with known camera
trajectory; we assert absolute trajectory error and the export formats.
"""

import os
import struct
import zlib

import numpy as np

from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
from multimotionfusion_tpu.engine import MultiMotionFusionTPU
from multimotionfusion_tpu.io import ply
from multimotionfusion_tpu.io.readers import KlgLogReader, SyntheticLogReader, open_log

CAM = CameraModel(width=80, height=60, fx=66.0, fy=66.0, cx=40.0, cy=30.0)


def _engine():
    cfg = EngineConfig(
        camera=CAM,
        enable_multi_model=False,
        surfels=SurfelConfig(max_surfels=16384, depth_cutoff=5.0),
    )
    return MultiMotionFusionTPU(cfg)


def test_static_tracking_ate(tmp_path):
    reader = SyntheticLogReader(
        CAM, num_frames=10, cam_step=(0.004, 0.0, 0.0), cam_rot_step=(0.0, 0.002, 0.0)
    )
    engine = _engine()
    for frame in reader:
        engine.process_frame(frame)
    assert engine.tick == 11

    est = np.stack([p for _, p in engine.global_model.pose_log])
    gt = np.stack(reader.gt_poses)
    # ATE on translations (trajectories share the first frame as origin)
    ate = np.sqrt(np.mean(np.sum((est[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=-1)))
    total_motion = np.linalg.norm(gt[-1, :3, 3] - gt[0, :3, 3])
    assert ate < max(0.2 * total_motion, 2e-3), (ate, total_motion)

    # exports: TUM poses + binary PLY cloud
    paths = engine.export_poses(str(tmp_path))
    assert os.path.exists(paths[0])
    rows = np.loadtxt(paths[0])
    assert rows.shape == (10, 8)
    # engine export applies the confidence threshold (10 frames cannot reach
    # it — matches reference exportModelPLY); raw export must round-trip
    engine.save_ply(str(tmp_path))
    raw = str(tmp_path / "raw.ply")
    ply.write_surfel_ply(raw, engine.global_model.download(), conf_threshold=0.0)
    cloud = ply.read_surfel_ply(raw)
    assert cloud["position"].shape[0] == engine.global_model.surfel_count()


def test_surfel_count_stable_on_static_scene():
    reader = SyntheticLogReader(CAM, num_frames=6, cam_step=(0, 0, 0), cam_rot_step=(0, 0, 0))
    engine = _engine()
    counts = []
    for frame in reader:
        engine.process_frame(frame)
        counts.append(engine.current_stats(sync=True)["surfels"])
    # static camera: map must not grow materially after initialisation
    assert counts[-1] < counts[0] * 1.05


def test_ply_roundtrip(tmp_path):
    n = 17
    rng = np.random.default_rng(0)
    surfels = {
        "position": rng.normal(size=(n, 3)).astype(np.float32),
        "normal": rng.normal(size=(n, 3)).astype(np.float32),
        "color": rng.uniform(0, 255, size=(n, 3)).astype(np.float32),
        "radius": rng.uniform(0.001, 0.01, size=n).astype(np.float32),
        "confidence": rng.uniform(0, 20, size=n).astype(np.float32),
    }
    path = str(tmp_path / "cloud.ply")
    ply.write_surfel_ply(path, surfels, conf_threshold=0.0)
    out = ply.read_surfel_ply(path)
    np.testing.assert_allclose(out["position"], surfels["position"], rtol=1e-6)
    np.testing.assert_allclose(out["radius"], surfels["radius"], rtol=1e-6)
    assert out["color"].max() <= 255


def test_klg_reader(tmp_path):
    """Write a 2-frame klg (zlib depth + raw BGR) and read it back."""
    w, h = 8, 6
    path = str(tmp_path / "log.klg")
    depth_mm = (np.arange(h * w, dtype=np.uint16) * 10).reshape(h, w)
    bgr = np.zeros((h, w, 3), np.uint8)
    bgr[..., 0] = 255  # blue in BGR
    with open(path, "wb") as f:
        f.write(struct.pack("<i", 2))
        for ts in (100, 200):
            dz = zlib.compress(depth_mm.tobytes())
            f.write(struct.pack("<qii", ts, len(dz), bgr.size))
            f.write(dz)
            f.write(bgr.tobytes())
    reader = KlgLogReader(path, width=w, height=h)
    frames = list(reader)
    assert len(frames) == 2
    assert frames[0].timestamp == 100
    np.testing.assert_allclose(
        frames[0].depth, depth_mm.astype(np.float32) * 0.001, atol=1e-6
    )
    # BGR -> RGB flip: blue plane must land in channel 2
    assert frames[0].rgb[0, 0, 2] == 255 and frames[0].rgb[0, 0, 0] == 0


def test_prefetch_reader_transparent():
    """PrefetchReader (the reference ImageLogReader's buffering thread) must
    be invisible: same frames, same order, errors surfaced at the consumer."""
    from multimotionfusion_tpu.io.readers import PrefetchReader

    inner = SyntheticLogReader(CAM, num_frames=6, cam_step=(0.002, 0, 0))
    direct = list(inner)
    pre = list(PrefetchReader(inner, depth=2))
    assert len(pre) == len(direct) == 6
    for a, b in zip(direct, pre):
        assert a.timestamp == b.timestamp
        np.testing.assert_array_equal(a.rgb, b.rgb)
        np.testing.assert_array_equal(a.depth, b.depth)
    assert len(PrefetchReader(inner)) == 6

    class Boom(SyntheticLogReader):
        def __iter__(self):
            it = super().__iter__()
            yield next(it)
            raise RuntimeError("decode failed")

    import pytest

    got = []
    with pytest.raises(RuntimeError, match="decode failed"):
        for f in PrefetchReader(Boom(CAM, num_frames=3)):
            got.append(f)
    assert len(got) == 1  # frames before the failure still arrive


def test_open_log_dispatch(tmp_path):
    r = open_log("synthetic", CAM)
    assert isinstance(r, SyntheticLogReader)
    import pytest

    with pytest.raises(FileNotFoundError):
        open_log("x.bag")  # dispatches to the rosbag reader


def test_runtime_controls():
    """Runtime control surface (reference ROS services, RosInterface.cpp)."""
    engine = _engine()
    reader = SyntheticLogReader(CAM, num_frames=3)
    it = iter(reader)
    engine.process_frame(next(it))
    engine.process_frame(next(it))
    assert engine.tick == 3
    engine.set_odom_init("")
    assert engine.cfg.odom_init == ""
    engine.set_icp_refine(True)
    engine.set_segm_mode("flow_crf")
    engine.set_inhibit_new_models(True)
    assert not engine.cfg.enable_model_spawning
    engine.reset()
    assert engine.tick == 1 and engine.state is None
    engine.process_frame(next(it))
    assert engine.tick == 2


def test_batched_matches_single_frame():
    """process_frames (lax.scan batch) must track the same trajectory as
    per-frame processing (same program, amortised dispatch)."""
    import dataclasses

    cfg = dataclasses.replace(
        EngineConfig(
            camera=CAM,
            enable_multi_model=False,
            surfels=SurfelConfig(max_surfels=16384, depth_cutoff=5.0),
        ),
        odom_init="",
    )
    frames = list(
        SyntheticLogReader(CAM, num_frames=7, cam_step=(0.004, 0.0, 0.0))
    )
    e1 = MultiMotionFusionTPU(cfg)
    for f in frames:
        e1.process_frame(f)
    e1.finish()
    e2 = MultiMotionFusionTPU(cfg)
    e2.process_frame(frames[0])
    e2.process_frames(frames[1:4])
    e2.process_frames(frames[4:7])
    e2.finish()
    p1 = np.asarray(e1.state.pose)
    p2 = np.asarray(e2.state.pose)
    assert np.allclose(p1, p2, atol=1e-5), (p1, p2)
    assert e1.tick == e2.tick
    # pose log expansion covers batched entries
    log = e2._expand_pose_log()
    assert len(log) == 7
    assert np.allclose(log[-1][1], p2, atol=1e-6)


def test_checkpoint_resume(tmp_path):
    """Full-session save/resume: an interrupted-and-resumed run must continue
    the trajectory exactly like an uninterrupted one (the reference has no
    session resume at all — SURVEY.md §5.4)."""
    import dataclasses

    cfg = dataclasses.replace(
        EngineConfig(
            camera=CAM,
            enable_multi_model=False,
            surfels=SurfelConfig(max_surfels=16384, depth_cutoff=5.0),
        ),
        odom_init="",
    )
    frames = list(
        SyntheticLogReader(CAM, num_frames=7, cam_step=(0.004, 0.0, 0.0))
    )
    e1 = MultiMotionFusionTPU(cfg)
    for f in frames:
        e1.process_frame(f)
    e1.finish()

    e2 = MultiMotionFusionTPU(cfg)
    for f in frames[:4]:
        e2.process_frame(f)
    ck = str(tmp_path / "sess.ckpt")
    e2.save_checkpoint(ck)

    e3 = MultiMotionFusionTPU(cfg)
    e3.load_checkpoint(ck)
    assert e3.tick == 5
    for f in frames[4:]:
        e3.process_frame(f)
    e3.finish()

    p_full = np.asarray(e1.state.pose)
    p_resumed = np.asarray(e3.state.pose)
    assert np.allclose(p_full, p_resumed, atol=1e-6), (p_full, p_resumed)
    assert len(e3._expand_pose_log()) == 7
    # poses exported from the resumed session cover the whole trajectory
    paths = e3.export_poses(str(tmp_path))
    assert np.loadtxt(paths[0]).shape == (7, 8)
