"""Video-URI reader tests (the PangolinReader slot).

The reference's PangolinReader consumes a two-stream video URI (16-bit depth
+ 8-bit RGB), rescales to the working resolution and converts depth to metres
(GUI/Tools/PangolinReader.cpp:20-75). Exercised here with OpenCV
image-sequence sources — the container-less equivalent of Pangolin's
images:// URIs.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from multimotionfusion_tpu.io.readers import open_log  # noqa: E402
from multimotionfusion_tpu.io.video import VideoLogReader  # noqa: E402


def _write_seq(tmp_path, n=4, w=32, h=24):
    for i in range(n):
        depth = np.full((h, w), 1500 + 10 * i, np.uint16)  # millimetres
        rgb = np.zeros((h, w, 3), np.uint8)
        rgb[..., 2] = 10 * i + 5  # red in RGB order = channel 2 of cv2's BGR
        cv2.imwrite(str(tmp_path / f"depth_{i:04d}.png"), depth)
        cv2.imwrite(str(tmp_path / f"rgb_{i:04d}.png"), rgb)
    return (
        str(tmp_path / "depth_%04d.png"),
        str(tmp_path / "rgb_%04d.png"),
    )


def test_video_reader_depth_metres_and_rgb_order(tmp_path):
    dsrc, csrc = _write_seq(tmp_path)
    r = VideoLogReader(f"video:{dsrc};{csrc}", width=32, height=24)
    frames = list(r)
    assert len(frames) == 4
    f0 = frames[0]
    assert f0.depth.dtype == np.float32
    assert np.allclose(f0.depth, 1.5)  # 1500 mm -> 1.5 m (x0.001)
    # flip_colors undoes cv2's BGR: the written "red" lands in channel 0
    assert f0.rgb[0, 0, 0] == 5 and f0.rgb[0, 0, 2] == 0
    assert np.allclose(frames[3].depth, 1.53)


def test_video_reader_resamples_to_working_resolution(tmp_path):
    dsrc, csrc = _write_seq(tmp_path, w=64, h=48)
    r = VideoLogReader(f"video:{dsrc};{csrc}", width=32, height=24)
    f = next(iter(r))
    assert f.depth.shape == (24, 32) and f.rgb.shape == (24, 32, 3)
    assert np.allclose(f.depth, 1.5)


def test_video_reader_rejects_single_stream():
    with pytest.raises(ValueError, match="two sources"):
        VideoLogReader("video:only_one.mp4")


def test_open_log_dispatches_video(tmp_path):
    dsrc, csrc = _write_seq(tmp_path)
    r = open_log(f"video:{dsrc};{csrc}")
    assert isinstance(r, VideoLogReader)
    assert len(r) == 4


def test_video_reader_runs_engine(tmp_path):
    """End-to-end: a video URI drives the engine like any other log source."""
    from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
    from multimotionfusion_tpu.engine import MultiMotionFusionTPU
    from multimotionfusion_tpu.io.readers import SyntheticLogReader

    cam = CameraModel(width=64, height=48, fx=52.8, fy=52.8, cx=32, cy=24)
    frames = list(SyntheticLogReader(cam, num_frames=3,
                                     cam_step=(0.002, 0.0, 0.0)))
    for i, f in enumerate(frames):
        cv2.imwrite(
            str(tmp_path / f"d_{i:02d}.png"),
            (f.depth * 1000).astype(np.uint16),
        )
        cv2.imwrite(str(tmp_path / f"c_{i:02d}.png"), f.rgb[..., ::-1])
    r = VideoLogReader(
        f"video:{tmp_path}/d_%02d.png;{tmp_path}/c_%02d.png",
        width=64, height=48,
    )
    cfg = EngineConfig(
        camera=cam, enable_multi_model=False, odom_init="",
        surfels=SurfelConfig(max_surfels=1 << 12),
    )
    eng = MultiMotionFusionTPU(cfg)
    for f in r:
        eng.process_frame(f)
    eng.finish()
    assert eng.tick == 4  # tick starts at 1 (see test_end_to_end: 10 -> 11)
