"""Live TCP frame source (LiveLogReader / RosNodeReader transport slot)."""

import threading

import numpy as np

from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
from multimotionfusion_tpu.io import live
from multimotionfusion_tpu.io.frame import FrameData
from multimotionfusion_tpu.io.readers import SyntheticLogReader, open_log

CAM = CameraModel(width=80, height=60, fx=66.0, fy=66.0, cx=40.0, cy=30.0)


def _frames(n):
    return list(SyntheticLogReader(CAM, num_frames=n, cam_step=(0.003, 0, 0)))


def _publish_async(frames, cam, port, **kw):
    t = threading.Thread(
        target=live.publish_frames, args=(frames, cam, port), kwargs=kw,
        daemon=True,
    )
    t.start()
    return t


def test_live_roundtrip_and_intrinsics():
    frames = _frames(5)
    reader = live.LiveSocketReader(port=0, timeout=10.0)
    try:
        _publish_async(frames, CAM, reader.port)
        cam = reader.intrinsics()  # blocks until the handshake (camera_info)
        assert cam is not None and (cam.width, cam.height) == (80, 60)
        assert abs(cam.fx - 66.0) < 1e-5
        got = list(reader)
        assert 1 <= len(got) <= 5  # newest-wins may legally skip frames
        f = got[-1]
        assert f.timestamp == frames[-1].timestamp
        np.testing.assert_array_equal(f.rgb, frames[-1].rgb)
        # depth survives the u16-millimetre wire quantisation
        np.testing.assert_allclose(f.depth, frames[-1].depth, atol=5.1e-4)
    finally:
        reader.close()


def test_live_compressed_fifo_order():
    frames = _frames(4)
    reader = live.LiveSocketReader(port=0, buffer_frames=16, timeout=10.0)
    try:
        t = _publish_async(frames, CAM, reader.port, compress=True)
        t.join(10.0)
        got = []
        while True:
            f = reader.next_frame(latest=False)  # FIFO drain
            if f is None:
                break
            got.append(f)
        assert [f.timestamp for f in got] == [f.timestamp for f in frames]
    finally:
        reader.close()


def test_live_newest_wins_drop_policy():
    """LiveLogReader semantics: a slow consumer gets the newest frame; aged
    and skipped frames are counted in `dropped`."""
    frames = _frames(10)
    reader = live.LiveSocketReader(port=0, buffer_frames=4, timeout=10.0)
    try:
        t = _publish_async(frames, CAM, reader.port)
        t.join(10.0)
        # wait until the pump thread has drained the socket to EOF (the
        # publisher returning only means the bytes left ITS send buffer)
        with reader._cv:
            assert reader._cv.wait_for(lambda: reader._eof, timeout=10.0)
        f = reader.next_frame(latest=True)
        assert f is not None and f.timestamp == frames[-1].timestamp
        assert reader.dropped == 9  # 6 aged out of the ring + 3 skipped
        assert reader.next_frame(latest=True) is None  # EOF after close
    finally:
        reader.close()


def test_open_log_dispatch_live():
    reader = open_log("live:0")
    try:
        assert isinstance(reader, live.LiveSocketReader)
        assert reader.port > 0
        assert len(reader) == 0  # unbounded, like the reference live readers
    finally:
        reader.close()


def test_live_drives_engine_end_to_end():
    """Engine consumes a live stream exactly like a log (the production live
    pattern: intrinsics from the handshake, frames as they arrive)."""
    frames = _frames(4)
    reader = live.LiveSocketReader(port=0, buffer_frames=16, timeout=10.0)
    try:
        _publish_async(frames, CAM, reader.port)
        cam = reader.intrinsics()
        cfg = EngineConfig(
            camera=cam, enable_multi_model=False, odom_init="",
            surfels=SurfelConfig(max_surfels=16384, depth_cutoff=5.0),
        )
        from multimotionfusion_tpu.engine import MultiMotionFusionTPU

        engine = MultiMotionFusionTPU(cfg)
        seen = 0
        while True:
            f = reader.next_frame(latest=False)
            if f is None:
                break
            engine.process_frame(f)
            seen += 1
        stats = engine.finish()
        assert seen == 4 and engine.tick == 5
        assert stats["surfels"] > 100
    finally:
        reader.close()


def test_live_gt_pose_channel_end_to_end():
    """v2 pose channel: ground truth rides WITH the frames (the live analogue
    of the reference's tf lookup, RosNodeReader.cpp:142-165) and drives
    '-init tf' — the engine's trajectory must follow the streamed GT."""
    from scipy.spatial.transform import Rotation

    frames = _frames(5)
    # attach absolute GT poses with a constant world offset: the consumer
    # must re-base to the FIRST received pose (relative-to-first convention)
    base = np.eye(4)
    base[:3, :3] = Rotation.from_rotvec([0.0, 0.3, 0.0]).as_matrix()
    base[:3, 3] = [1.0, 2.0, 3.0]
    gts = []
    for i, f in enumerate(frames):
        T = np.eye(4)
        T[:3, 3] = [0.003 * i, 0.0, 0.0]
        f.gt_pose = base @ T
        gts.append(T)

    reader = live.LiveSocketReader(port=0, buffer_frames=16, timeout=10.0)
    try:
        t = _publish_async(frames, CAM, reader.port)
        t.join(10.0)
        cam = reader.intrinsics()
        cfg = EngineConfig(
            camera=cam, enable_multi_model=False, odom_init="tf",
            icp_refine=False,
            surfels=SurfelConfig(max_surfels=16384, depth_cutoff=5.0),
        )
        from multimotionfusion_tpu.engine import MultiMotionFusionTPU

        engine = MultiMotionFusionTPU(cfg)
        while True:
            f = reader.next_frame(latest=False)
            if f is None:
                break
            gt = reader.get_incremental_transformation(f.timestamp)
            assert gt is not None  # the pose channel delivered
            engine.process_frame(f, gt_pose=gt)
        engine.finish()
        # with -init tf and no refinement the trajectory IS the GT,
        # re-based to identity at the first frame
        est = np.asarray(engine.state.pose)
        np.testing.assert_allclose(est, gts[-1], atol=1e-4)
    finally:
        reader.close()
