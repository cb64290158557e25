"""ROS1 bag reader tests: synthetic bags written from scratch, then played
back through multimotionfusion_tpu.io.rosbag.RosBagReader.

Covers the reference behaviours (GUI/Tools/RosBagReader.cpp): greedy global
colour<->depth stamp matching (:200-253), intrinsics from the first
CameraInfo + crop/scale adjustment (ros_common.cpp), uint16 mm -> f32 m depth
(:99-102), tf-based ground-truth poses relative to the first query (:172-184).
"""

import struct

import numpy as np
import pytest

from multimotionfusion_tpu.io.rosbag import RosBagReader, read_bag_messages


# ---------------------------------------------------------------------------
# minimal bag v2.0 writer (tests only)


def _hdr(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        f = k + b"=" + v
        out += struct.pack("<I", len(f)) + f
    return out


def _record(hdr_fields: dict, data: bytes) -> bytes:
    h = _hdr(hdr_fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


class BagWriter:
    def __init__(self, path):
        self.path = path
        self.conns = {}
        self.records = []

    def connection(self, topic: str, msg_type: str) -> int:
        cid = len(self.conns)
        self.conns[cid] = _record(
            {b"op": b"\x07", b"conn": struct.pack("<I", cid),
             b"topic": topic.encode()},
            _hdr({b"topic": topic.encode(), b"type": msg_type.encode(),
                  b"md5sum": b"0" * 32, b"message_definition": b""}),
        )
        return cid

    def message(self, cid: int, t_ns: int, payload: bytes):
        self.records.append(
            _record(
                {b"op": b"\x02", b"conn": struct.pack("<I", cid),
                 b"time": struct.pack("<II", t_ns // 10**9, t_ns % 10**9)},
                payload,
            )
        )

    def write(self, chunked=False, compression=b"none"):
        with open(self.path, "wb") as f:
            f.write(b"#ROSBAG V2.0\n")
            body = b"".join(self.conns.values()) + b"".join(self.records)
            if chunked:
                raw = body
                if compression == b"bz2":
                    import bz2

                    body = bz2.compress(raw)
                f.write(
                    _record(
                        {b"op": b"\x05", b"compression": compression,
                         b"size": struct.pack("<I", len(raw))},
                        body,
                    )
                )
            else:
                f.write(body)


# message payload builders


def _ser_header(stamp_ns: int, frame: str) -> bytes:
    return (
        struct.pack("<III", 0, stamp_ns // 10**9, stamp_ns % 10**9)
        + struct.pack("<I", len(frame))
        + frame.encode()
    )


def ser_camera_info(stamp, frame, w, h, fx, fy, cx, cy) -> bytes:
    P = np.zeros(12)
    P[0], P[5], P[2], P[6], P[10] = fx, fy, cx, cy, 1.0
    return (
        _ser_header(stamp, frame)
        + struct.pack("<II", h, w)
        + struct.pack("<I", 0)  # distortion_model ""
        + struct.pack("<I", 0)  # D empty
        + np.zeros(9).tobytes()  # K
        + np.zeros(9).tobytes()  # R
        + P.tobytes()
        + struct.pack("<II", 0, 0)  # binning
        + struct.pack("<IIII", 0, 0, 0, 0) + b"\x00"  # ROI
    )


def ser_image(stamp, frame, arr: np.ndarray, encoding: str) -> bytes:
    h, w = arr.shape[:2]
    data = arr.tobytes()
    step = len(data) // h
    return (
        _ser_header(stamp, frame)
        + struct.pack("<II", h, w)
        + struct.pack("<I", len(encoding)) + encoding.encode()
        + b"\x00"
        + struct.pack("<I", step)
        + struct.pack("<I", len(data)) + data
    )


def ser_tf(transforms) -> bytes:
    out = struct.pack("<I", len(transforms))
    for stamp, parent, child, trans, quat in transforms:
        out += _ser_header(stamp, parent)
        out += struct.pack("<I", len(child)) + child.encode()
        out += struct.pack("<3d", *trans) + struct.pack("<4d", *quat)
    return out


S = 10**9  # 1 second in ns


def _make_bag(path, chunked=False, compression=b"none", with_tf=True,
              src_wh=(64, 48), n=4):
    w = BagWriter(path)
    ci = w.connection("/cam/color/camera_info", "sensor_msgs/CameraInfo")
    col = w.connection("/cam/color/image_raw", "sensor_msgs/Image")
    dep = w.connection("/cam/depth/image_raw", "sensor_msgs/Image")
    tf = w.connection("/tf", "tf2_msgs/TFMessage")
    tfs = w.connection("/tf_static", "tf2_msgs/TFMessage")

    sw, sh = src_wh
    w.message(ci, S, ser_camera_info(S, "cam_color", sw, sh, 52.0, 52.0,
                                     sw / 2, sh / 2))
    rng = np.random.default_rng(0)
    for i in range(n):
        t = S + i * S // 10
        rgb = rng.integers(0, 255, (sh, sw, 3), dtype=np.uint8)
        depth_mm = rng.integers(500, 3000, (sh, sw), dtype=np.uint16)
        # colour and depth stamps deliberately offset by 8 ms (sync test)
        w.message(col, t, ser_image(t, "cam_color", rgb, "rgb8"))
        w.message(dep, t + 8_000_000,
                  ser_image(t + 8_000_000, "cam_color", depth_mm, "16uc1"))
        if with_tf:
            # camera moves +1 cm/x per frame
            w.message(tf, t, ser_tf([
                (t, "world", "base", (0.01 * i, 0.0, 0.0), (0, 0, 0, 1)),
            ]))
    if with_tf:
        w.message(tfs, S, ser_tf([
            (S, "base", "cam_color", (0.0, 0.1, 0.0), (0, 0, 0, 1)),
        ]))
    w.write(chunked=chunked, compression=compression)
    return path


def test_container_roundtrip(tmp_path):
    p = _make_bag(tmp_path / "t.bag")
    msgs = list(read_bag_messages(str(p)))
    topics = {c.topic for c, _, _ in msgs}
    assert "/cam/color/image_raw" in topics
    assert "/tf" in topics


@pytest.mark.parametrize("chunked,comp", [(False, b"none"), (True, b"none"),
                                          (True, b"bz2")])
def test_reader_frames(tmp_path, chunked, comp):
    p = _make_bag(tmp_path / "t.bag", chunked=chunked, compression=comp)
    r = RosBagReader(str(p))
    assert len(r) == 4
    frames = list(r)
    assert len(frames) == 4
    f = frames[0]
    assert f.rgb.shape == (48, 64, 3) and f.rgb.dtype == np.uint8
    assert f.depth.dtype == np.float32
    assert 0.5 <= float(f.depth.min()) and float(f.depth.max()) <= 3.0
    # frames ordered by colour stamp
    ts = [f.timestamp for f in frames]
    assert ts == sorted(ts)
    cam = r.intrinsics()
    assert (cam.width, cam.height) == (64, 48)
    assert cam.fx == 52.0


def test_crop_and_scale_intrinsics(tmp_path):
    # source 64x48 -> target 32x24: pure scale by 2 (same aspect)
    p = _make_bag(tmp_path / "t.bag")
    r = RosBagReader(str(p), target_dimensions=(32, 24))
    cam = r.intrinsics()
    assert (cam.width, cam.height) == (32, 24)
    assert abs(cam.fx - 26.0) < 1e-6
    f = next(iter(r))
    assert f.rgb.shape == (24, 32, 3)
    assert f.depth.shape == (24, 32)


def test_ground_truth_poses(tmp_path):
    p = _make_bag(tmp_path / "t.bag")
    r = RosBagReader(str(p))
    frames = list(r)  # sets frame_gt_camera from the colour header
    t0, t2 = frames[0].timestamp, frames[2].timestamp
    P0 = r.get_incremental_transformation(t0)
    P2 = r.get_incremental_transformation(t2)
    assert np.allclose(P0, np.eye(4), atol=1e-9)  # relative to first
    # base moved +0.02 m in x between frame 0 and 2
    assert abs(P2[0, 3] - 0.02) < 1e-6
    assert np.allclose(P2[:3, :3], np.eye(3), atol=1e-9)


def test_sync_greedy_global(tmp_path):
    # colour at t, t+100ms; depth only ONE message near the second colour:
    # greedy global matching must pair it with the closer colour stamp
    w = BagWriter(tmp_path / "s.bag")
    ci = w.connection("/c/camera_info", "sensor_msgs/CameraInfo")
    col = w.connection("/c/image", "sensor_msgs/Image")
    dep = w.connection("/c/depth_image", "sensor_msgs/Image")
    w.message(ci, S, ser_camera_info(S, "f", 8, 8, 5, 5, 4, 4))
    rgb = np.zeros((8, 8, 3), np.uint8)
    d16 = np.full((8, 8), 1000, np.uint16)
    for t in (S, S + 100_000_000):
        w.message(col, t, ser_image(t, "f", rgb, "rgb8"))
    w.message(dep, S + 95_000_000, ser_image(S + 95_000_000, "f", d16, "16uc1"))
    w.write()
    r = RosBagReader(str(tmp_path / "s.bag"))
    assert len(r) == 1
    (f,) = list(r)
    assert f.timestamp == S + 100_000_000  # paired with the CLOSER colour
