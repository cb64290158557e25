"""ROS1 bag reader: deterministic frame-by-frame playback of recorded RGB-D.

Pure-Python counterpart of reference GUI/Tools/RosBagReader.{hpp,cpp} (the
reference's primary evaluation input — README.md:104 "process them
deterministically frame-by-frame"). No ROS installation needed: the ROS1 bag
v2.0 container and the handful of message types involved are parsed directly.

Behavioural parity points (cited to the reference):
- colour<->depth synchronisation: greedy GLOBAL best-match — sort the full
  cross product of header stamps by |dt|, keep each message's first (smallest
  distance) pairing, order pairs by colour stamp (RosBagReader.cpp:200-253);
- intrinsics from the FIRST CameraInfo message; optional scale+centre-crop to
  target dimensions with intrinsics adjusted via the projection matrix P
  (RosBagReader.cpp:29-37, ros_common.cpp get_crop_roi/ImageCropTarget);
- uint16 depth is millimetres -> metres * 1e-3 (RosBagReader.cpp:99-102);
- ground-truth pose: all /tf + /tf_static cached; camera frame defaults to the
  colour header frame_id; root = walk parents to the top; pose(t) is reported
  relative to the first queried pose: inv(P(t_ref)) @ P(t)
  (RosBagReader.cpp:104-131, 172-184);
- colour and depth must share a frame_id (RosBagReader.cpp:133-134).
"""

from __future__ import annotations

import bz2
import os
import struct
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from multimotionfusion_tpu.config import CameraModel
from multimotionfusion_tpu.io.frame import FrameData
from multimotionfusion_tpu.io.readers import LogReader

# ---------------------------------------------------------------------------
# low-level bag container (http://wiki.ros.org/Bags/Format/2.0)

_OP_MSG = 0x02
_OP_BAGHDR = 0x03
_OP_INDEX = 0x04
_OP_CHUNK = 0x05
_OP_CHUNKINFO = 0x06
_OP_CONN = 0x07


def _parse_header(buf: bytes) -> Dict[bytes, bytes]:
    fields = {}
    off = 0
    while off < len(buf):
        (flen,) = struct.unpack_from("<I", buf, off)
        off += 4
        field = buf[off : off + flen]
        off += flen
        k, _, v = field.partition(b"=")
        fields[k] = v
    return fields


class _Connection:
    def __init__(self, cid: int, topic: str, hdr: Dict[bytes, bytes]):
        self.id = cid
        self.topic = topic
        self.type = hdr.get(b"type", b"").decode()
        self.md5 = hdr.get(b"md5sum", b"").decode()


def read_bag_messages(path: str):
    """Yield (connection, time_ns, raw_bytes) for every message in the bag."""
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"#ROSBAG V2.0"):
            raise ValueError(f"{path}: not a ROS1 bag v2.0 (got {magic!r})")
        conns: Dict[int, _Connection] = {}

        def records(stream_read, total=None):
            consumed = 0
            while total is None or consumed < total:
                head = stream_read(4)
                if len(head) < 4:
                    return
                (hlen,) = struct.unpack("<I", head)
                hdr = _parse_header(stream_read(hlen))
                (dlen,) = struct.unpack("<I", stream_read(4))
                data = stream_read(dlen)
                consumed += 8 + hlen + dlen
                yield hdr, data

        for hdr, data in records(f.read):
            op = hdr[b"op"][0]
            if op == _OP_CONN:
                (cid,) = struct.unpack("<I", hdr[b"conn"])
                topic = hdr[b"topic"].decode()
                conns[cid] = _Connection(cid, topic, _parse_header(data))
            elif op == _OP_CHUNK:
                comp = hdr.get(b"compression", b"none")
                if comp == b"bz2":
                    data = bz2.decompress(data)
                elif comp == b"lz4":
                    try:
                        import lz4.frame  # pragma: no cover

                        data = lz4.frame.decompress(data)
                    except ImportError as e:  # pragma: no cover
                        raise RuntimeError(
                            "bag uses lz4 chunk compression; lz4 module unavailable"
                        ) from e
                elif comp != b"none":
                    raise RuntimeError(f"unknown chunk compression {comp!r}")
                off = [0]

                def cread(n, _d=data, _o=off):
                    out = _d[_o[0] : _o[0] + n]
                    _o[0] += n
                    return out

                for chdr, cdata in records(cread, total=len(data)):
                    cop = chdr[b"op"][0]
                    if cop == _OP_CONN:
                        (cid,) = struct.unpack("<I", chdr[b"conn"])
                        topic = chdr[b"topic"].decode()
                        conns[cid] = _Connection(cid, topic, _parse_header(cdata))
                    elif cop == _OP_MSG:
                        (cid,) = struct.unpack("<I", chdr[b"conn"])
                        secs, nsecs = struct.unpack("<II", chdr[b"time"])
                        yield conns[cid], secs * 1_000_000_000 + nsecs, cdata
            elif op == _OP_MSG:  # unchunked bags
                (cid,) = struct.unpack("<I", hdr[b"conn"])
                secs, nsecs = struct.unpack("<II", hdr[b"time"])
                yield conns[cid], secs * 1_000_000_000 + nsecs, data


# ---------------------------------------------------------------------------
# message deserialisation (little-endian ROS1 serialisation)


class _Cursor:
    __slots__ = ("buf", "off")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def u32(self) -> int:
        (v,) = struct.unpack_from("<I", self.buf, self.off)
        self.off += 4
        return v

    def u8(self) -> int:
        v = self.buf[self.off]
        self.off += 1
        return v

    def f64(self) -> float:
        (v,) = struct.unpack_from("<d", self.buf, self.off)
        self.off += 8
        return v

    def f64s(self, n: int) -> np.ndarray:
        v = np.frombuffer(self.buf, "<f8", n, self.off)
        self.off += 8 * n
        return v

    def string(self) -> str:
        n = self.u32()
        v = self.buf[self.off : self.off + n].decode(errors="replace")
        self.off += n
        return v

    def raw(self, n: int) -> bytes:
        v = self.buf[self.off : self.off + n]
        self.off += n
        return v

    def header(self) -> Tuple[int, str]:
        """std_msgs/Header -> (stamp_ns, frame_id)."""
        self.u32()  # seq
        secs, nsecs = self.u32(), self.u32()
        frame = self.string()
        return secs * 1_000_000_000 + nsecs, frame


def parse_camera_info(data: bytes):
    c = _Cursor(data)
    stamp, frame = c.header()
    height, width = c.u32(), c.u32()
    c.string()  # distortion_model
    c.f64s(c.u32())  # D
    c.f64s(9)  # K
    c.f64s(9)  # R
    P = c.f64s(12)
    return dict(stamp=stamp, frame=frame, width=width, height=height,
                fx=P[0], fy=P[5], cx=P[2], cy=P[6])


def parse_image(data: bytes):
    c = _Cursor(data)
    stamp, frame = c.header()
    height, width = c.u32(), c.u32()
    encoding = c.string()
    c.u8()  # is_bigendian
    step = c.u32()
    raw = c.raw(c.u32())
    return dict(stamp=stamp, frame=frame, height=height, width=width,
                encoding=encoding, step=step, data=raw)


def parse_compressed_image(data: bytes):
    c = _Cursor(data)
    stamp, frame = c.header()
    fmt = c.string()
    raw = c.raw(c.u32())
    return dict(stamp=stamp, frame=frame, format=fmt, data=raw)


def parse_tf_message(data: bytes):
    c = _Cursor(data)
    out = []
    for _ in range(c.u32()):
        stamp, frame = c.header()
        child = c.string()
        tx, ty, tz = c.f64(), c.f64(), c.f64()
        qx, qy, qz, qw = c.f64(), c.f64(), c.f64(), c.f64()
        out.append((stamp, frame, child, (tx, ty, tz), (qx, qy, qz, qw)))
    return out


def _image_to_numpy(msg: dict) -> np.ndarray:
    enc = msg["encoding"].lower()
    h, w = msg["height"], msg["width"]
    dt, ch = {
        "rgb8": (np.uint8, 3), "bgr8": (np.uint8, 3), "bgra8": (np.uint8, 4),
        "rgba8": (np.uint8, 4), "mono8": (np.uint8, 1), "8uc1": (np.uint8, 1),
        "mono16": (np.uint16, 1), "16uc1": (np.uint16, 1),
        "32fc1": (np.float32, 1),
    }[enc]
    arr = np.frombuffer(msg["data"], dt).reshape(h, msg["step"] // np.dtype(dt).itemsize)[
        :, : w * ch
    ]
    arr = arr.reshape(h, w, ch) if ch > 1 else arr.reshape(h, w)
    if enc in ("bgr8", "bgra8"):
        arr = arr[..., 2::-1]
    elif enc == "rgba8":
        arr = arr[..., :3]
    elif enc in ("mono8", "8uc1"):
        arr = np.repeat(arr[..., None], 3, axis=-1)
    return np.ascontiguousarray(arr)


def _decode_image_any(conn_type: str, data: bytes) -> dict:
    """Image or CompressedImage message -> dict with a decoded numpy array."""
    import cv2

    if conn_type.endswith("CompressedImage"):
        msg = parse_compressed_image(data)
        raw = np.frombuffer(msg["data"], np.uint8)
        if "compressedDepth" in msg["format"]:
            # [compressed_depth_image_transport ConfigHeader: format u32 +
            #  2 float params] then PNG of inverse-depth u16 or raw depth
            img = cv2.imdecode(raw[12:], cv2.IMREAD_ANYDEPTH)
        else:
            img = cv2.imdecode(raw, cv2.IMREAD_UNCHANGED)
            if img is not None and img.ndim == 3:
                img = np.ascontiguousarray(img[..., 2::-1])  # BGR -> RGB
        msg["array"] = img
        return msg
    msg = parse_image(data)
    msg["array"] = _image_to_numpy(msg)
    return msg


# ---------------------------------------------------------------------------
# minimal tf2 buffer: parent-chain lookup with linear interpolation


def _quat_mat(q) -> np.ndarray:
    x, y, z, w = q
    n = (x * x + y * y + z * z + w * w) or 1.0
    x, y, z, w = (v / np.sqrt(n) for v in (x, y, z, w))
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def _slerp(q0, q1, t):
    q0 = np.asarray(q0, float)
    q1 = np.asarray(q1, float)
    d = float(np.dot(q0, q1))
    if d < 0:
        q1, d = -q1, -d
    if d > 0.9995:
        q = q0 + t * (q1 - q0)
        return q / np.linalg.norm(q)
    th = np.arccos(np.clip(d, -1, 1))
    return (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)


class TfBuffer:
    """child frame -> (parent, time-sorted [(t, trans, quat)]) chains."""

    def __init__(self):
        self.edges: Dict[str, Tuple[str, List[tuple]]] = {}
        self.static: Dict[str, bool] = {}

    def set_transform(self, stamp, parent, child, trans, quat, is_static):
        parent = parent.lstrip("/")
        child = child.lstrip("/")
        if child not in self.edges or self.edges[child][0] != parent:
            self.edges[child] = (parent, [])
            self.static[child] = is_static
        self.edges[child][1].append((stamp, trans, quat))

    def finalize(self):
        for _, series in self.edges.values():
            series.sort(key=lambda e: e[0])

    def frame_exists(self, frame: str) -> bool:
        frame = frame.lstrip("/")
        return frame in self.edges or any(
            p == frame for p, _ in self.edges.values()
        )

    def root_of(self, frame: str) -> str:
        frame = frame.lstrip("/")
        while frame in self.edges:
            frame = self.edges[frame][0]
        return frame

    def _edge_at(self, child: str, t: int) -> np.ndarray:
        parent, series = self.edges[child]
        if self.static.get(child) or len(series) == 1:
            _, trans, quat = series[0]
        else:
            import bisect

            times = [e[0] for e in series]
            i = bisect.bisect_left(times, t)
            if i == len(times) and t == times[-1]:
                i -= 1
            if i == 0 and t == times[0]:
                _, trans, quat = series[0]
            elif i == 0 or i == len(times):
                # tf2 raises ExtrapolationException outside the recorded range
                raise KeyError(
                    f"tf extrapolation for '{child}' at {t} "
                    f"(range {times[0]}..{times[-1]})"
                )
            else:
                t0, tr0, q0 = series[i - 1]
                t1, tr1, q1 = series[i]
                a = 0.0 if t1 == t0 else (t - t0) / (t1 - t0)
                trans = (1 - a) * np.asarray(tr0) + a * np.asarray(tr1)
                quat = _slerp(q0, q1, a)
        T = np.eye(4)
        T[:3, :3] = _quat_mat(quat)
        T[:3, 3] = trans
        return T

    def lookup(self, target: str, source: str, t: int) -> np.ndarray:
        """T such that p_target = T @ p_source; target must be an ancestor."""
        source = source.lstrip("/")
        target = target.lstrip("/")
        T = np.eye(4)
        frame = source
        while frame != target:
            if frame not in self.edges:
                raise KeyError(f"no tf chain from '{source}' to '{target}'")
            T = self._edge_at(frame, t) @ T
            frame = self.edges[frame][0]
        return T


# ---------------------------------------------------------------------------
# crop/scale target mapping (ros_common.cpp get_crop_roi + ImageCropTarget)


def _crop_roi(src_wh, tgt_wh):
    sw, sh = src_wh
    tw, th = tgt_wh
    r_w, r_h = sw / tw, sh / th
    if r_w > r_h:
        cw = int(round(sh * (tw / th)))
        return (sw - cw) // 2, 0, cw, sh, r_h
    if r_h > r_w:
        chh = int(round(sw / (tw / th)))
        return 0, (sh - chh) // 2, sw, chh, r_w
    return 0, 0, sw, sh, sw / tw if sw != tw else 1.0


class RosBagReader(LogReader):
    """Deterministic ROS1 bag playback (reference RosBagReader).

    Topics default to auto-detection: the first Image/CompressedImage topic
    whose name contains 'depth' becomes depth, any other becomes colour;
    camera_info prefers the colour camera's.
    """

    def __init__(
        self,
        path: str,
        topic_colour: str = "",
        topic_depth: str = "",
        topic_camera_info: str = "",
        target_dimensions: Optional[Tuple[int, int]] = None,
        frame_gt_camera: str = "",
    ):
        self.path = path
        self.tf = TfBuffer()
        self._ref_time = 0
        self.frame_gt_camera = frame_gt_camera
        self._frame_gt_root = ""

        img_types = ("sensor_msgs/Image", "sensor_msgs/CompressedImage")
        colour_msgs: Dict[int, tuple] = {}  # header stamp -> (conn_type, bytes)
        depth_msgs: Dict[int, tuple] = {}
        cam_info = None
        topics_seen: Dict[str, str] = {}

        for conn, t_ns, data in read_bag_messages(path):
            topics_seen.setdefault(conn.topic, conn.type)
            if conn.type == "tf2_msgs/TFMessage":
                is_static = "static" in conn.topic
                for stamp, parent, child, trans, quat in parse_tf_message(data):
                    self.tf.set_transform(stamp, parent, child, trans, quat, is_static)
                continue
            if conn.type == "sensor_msgs/CameraInfo":
                if not topic_camera_info:
                    topic_camera_info = conn.topic
                if conn.topic == topic_camera_info and cam_info is None:
                    cam_info = parse_camera_info(data)
                continue
            if conn.type not in img_types:
                continue
            if not topic_depth and "depth" in conn.topic:
                topic_depth = conn.topic
            elif not topic_colour and "depth" not in conn.topic:
                topic_colour = conn.topic
            if conn.topic == topic_colour:
                stamp = _Cursor(data).header()[0]
                colour_msgs[stamp] = (conn.type, data)
            elif conn.topic == topic_depth:
                stamp = _Cursor(data).header()[0]
                depth_msgs[stamp] = (conn.type, data)

        if not colour_msgs:
            raise RuntimeError(
                f"no images on colour topic '{topic_colour}' "
                f"(topics: {sorted(topics_seen)})"
            )
        if not depth_msgs:
            raise RuntimeError(f"no images on depth topic '{topic_depth}'")
        if cam_info is None:
            raise RuntimeError(
                f"no messages on camera_info topic '{topic_camera_info}'"
            )
        self.topic_colour, self.topic_depth = topic_colour, topic_depth
        self.tf.finalize()
        self.has_tf = bool(self.tf.edges)

        # --- greedy global sync (RosBagReader::sync) -----------------------
        ct = np.array(sorted(colour_msgs), np.int64)
        dt_ = np.array(sorted(depth_msgs), np.int64)
        diff = np.abs(ct[:, None] - dt_[None, :])
        order = np.argsort(diff, axis=None, kind="stable")
        ci, di = np.unravel_index(order, diff.shape)
        c_used = np.zeros(len(ct), bool)
        d_used = np.zeros(len(dt_), bool)
        matches = []
        for a, b in zip(ci, di):
            if not c_used[a] and not d_used[b]:
                matches.append((int(ct[a]), int(dt_[b])))
            c_used[a] = True
            d_used[b] = True
        matches.sort()
        self._matches = matches
        self._colour_msgs = colour_msgs
        self._depth_msgs = depth_msgs

        # --- intrinsics + crop target (ImageCropTarget) --------------------
        sw, sh = cam_info["width"], cam_info["height"]
        fx, fy, cx, cy = (cam_info[k] for k in ("fx", "fy", "cx", "cy"))
        if target_dimensions and tuple(target_dimensions) != (sw, sh):
            tw, th = target_dimensions
            rx, ry, cw, chh, scale = _crop_roi((sw, sh), (tw, th))
            self._roi = (rx, ry, cw, chh, tw, th)
            self._cam = CameraModel(
                width=tw, height=th, fx=fx / scale, fy=fy / scale,
                cx=(cx - rx) / scale, cy=(cy - ry) / scale,
            )
        else:
            self._roi = None
            self._cam = CameraModel(width=sw, height=sh, fx=fx, fy=fy, cx=cx, cy=cy)

    # -- LogReader API ------------------------------------------------------

    def intrinsics(self) -> Optional[CameraModel]:
        return self._cam

    def __len__(self) -> int:
        return len(self._matches)

    def _map_target(self, img: np.ndarray, nearest: bool) -> np.ndarray:
        if self._roi is None:
            return img
        import cv2

        rx, ry, cw, chh, tw, th = self._roi
        crop = img[ry : ry + chh, rx : rx + cw]
        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        return cv2.resize(crop, (tw, th), interpolation=interp)

    def __iter__(self) -> Iterator[FrameData]:
        for i, (cstamp, dstamp) in enumerate(self._matches):
            ctype, cdata = self._colour_msgs[cstamp]
            dtype_, ddata = self._depth_msgs[dstamp]
            cmsg = _decode_image_any(ctype, cdata)
            dmsg = _decode_image_any(dtype_, ddata)
            rgb = cmsg["array"]
            depth = dmsg["array"]
            if depth is None or rgb is None:
                continue
            if cmsg["frame"] != dmsg["frame"]:
                raise RuntimeError(
                    "colour and depth images are not registered into the "
                    f"same frame ({cmsg['frame']} vs {dmsg['frame']})"
                )
            if depth.dtype == np.uint16:
                depth = depth.astype(np.float32) * 1e-3
            depth = np.nan_to_num(depth.astype(np.float32))
            rgb = self._map_target(rgb, nearest=False)
            depth = self._map_target(depth, nearest=True)
            if not self.frame_gt_camera:
                self.frame_gt_camera = cmsg["frame"]
            yield FrameData(
                rgb=rgb, depth=depth, timestamp=cstamp, name=str(i)
            )

    # -- GroundTruthOdometryInterface ---------------------------------------

    def get_incremental_transformation(self, timestamp: int) -> Optional[np.ndarray]:
        """Camera pose at `timestamp` relative to the first queried pose
        (RosBagReader::getIncrementalTransformation, :172-184)."""
        if not self.has_tf or not timestamp:
            return None
        cam_frame = self.frame_gt_camera
        if not cam_frame:
            return None
        if not self._frame_gt_root:
            self._frame_gt_root = self.tf.root_of(cam_frame)
        try:
            P = self.tf.lookup(self._frame_gt_root, cam_frame, timestamp)
        except KeyError:
            return None
        if self._ref_time == 0:
            self._ref_time = timestamp
            self._ref_pose_inv = np.linalg.inv(
                self.tf.lookup(self._frame_gt_root, cam_frame, self._ref_time)
            )
        return (self._ref_pose_inv @ P).astype(np.float32)
