"""Live frame source: length-prefixed RGB-D frames over a TCP socket.

Transport-level counterpart of the reference's two live sources:

- ``GUI/Tools/LiveLogReader.cpp`` — an OpenNI2 camera pushing frames into a
  small in-memory buffer that the engine drains, always preferring the most
  recent frame (a camera has no flow control; stale frames are dropped);
- ``GUI/Tools/RosNodeReader.cpp`` — rgb + depth + camera_info subscribed over
  ROS transport, greedily synced, queued.

Neither OpenNI2 nor ROS exists in this environment; both are *transports*
delivering (intrinsics handshake, stream of timestamped RGB-D frames). This
module implements that contract over a plain TCP socket so any producer — a
camera daemon, a ROS bridge, a simulator — can feed the engine live:

wire format (little endian):
    handshake:  b"MMFL" u32 version  u32 width  u32 height
                f32 fx f32 fy f32 cx f32 cy  f32 depth_scale
    per frame:  b"FRAM" i64 timestamp_ns u8 flags
                u32 depth_nbytes  u32 rgb_nbytes
                [flags & 2: f32 tx ty tz qx qy qz qw — ground-truth camera
                 pose in the producer's world frame (v2; the live analogue of
                 the reference's per-frame tf lookup, RosNodeReader.cpp:142-165)]
                depth payload (u16 millimetres, optionally zlib: flags & 1)
                rgb payload   (u8 RGB interleaved, optionally zlib: flags & 1)

v1 producers (no pose channel) remain accepted; '-init tf' then has no live
ground truth, exactly like a camera without external tracking.

``LiveSocketReader`` accepts ONE producer connection, decodes frames on a
daemon thread into a bounded latest-wins deque (LiveLogReader's bufferSize
semantics: the engine reads the newest frame; anything it didn't get to is
dropped and counted), and iterates like every other LogReader so the CLI and
engine need no special casing. ``publish_frames`` is the matching producer
helper used by tests, tools, and bridges.
"""

from __future__ import annotations

import socket
import struct
import threading
import zlib
from collections import deque
from typing import Iterable, Iterator, Optional

import numpy as np

from multimotionfusion_tpu.config import CameraModel
from multimotionfusion_tpu.io.frame import FrameData
from multimotionfusion_tpu.io.readers import LogReader

_MAGIC = b"MMFL"
_FRAME = b"FRAM"
_VERSION = 2
_HANDSHAKE = struct.Struct("<4sIII5f")
_FRAME_HDR = struct.Struct("<4sqBII")
_POSE = struct.Struct("<7f")  # tx ty tz qx qy qz qw (flags & 2)
FLAG_ZLIB = 1
FLAG_POSE = 2


def _quat_to_mat(x, y, z, w) -> np.ndarray:
    n = max(np.sqrt(x * x + y * y + z * z + w * w), 1e-12)
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        np.float64,
    )


def _mat_to_quat(R: np.ndarray):
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return (
            (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
            (R[1, 0] - R[0, 1]) / s, 0.25 * s,
        )
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12)) * 2
    q = [0.0, 0.0, 0.0, (R[k, j] - R[j, k]) / s]
    q[i] = 0.25 * s
    q[j] = (R[j, i] + R[i, j]) / s
    q[k] = (R[k, i] + R[i, k]) / s
    return q[0], q[1], q[2], q[3]


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        k = sock.recv_into(view[got:], n - got)
        if k == 0:
            raise ConnectionError("live source closed mid-message")
        got += k
    return bytes(buf)


class LiveSocketReader(LogReader):
    """Listen for one producer and iterate its frames, newest-wins.

    == LiveLogReader: `buffer_frames` is the reference's bufferSize (it keeps
    10 camera frames; the engine takes the latest and the rest age out).
    `dropped` counts frames that aged out unread — the live analogue of the
    CLI's -rt frame-skip statistic.
    """

    def __init__(
        self,
        port: int = 0,
        host: str = "127.0.0.1",
        buffer_frames: int = 10,
        timeout: float = 30.0,
    ):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self.timeout = timeout
        self._buf: deque = deque(maxlen=buffer_frames)
        self._cv = threading.Condition()
        self._eof = False
        self._cam: Optional[CameraModel] = None
        self.dropped = 0
        # ground-truth poses received on the v2 pose channel, keyed by
        # timestamp; exposed first-relative like every other GT source
        self._gt: dict = {}
        self._gt_first: Optional[np.ndarray] = None
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()

    # -- producer side ------------------------------------------------------

    def _pump(self):
        try:
            self._srv.settimeout(self.timeout)
            conn, _ = self._srv.accept()
            conn.settimeout(self.timeout)
            hs = _HANDSHAKE.unpack(_recv_exact(conn, _HANDSHAKE.size))
            magic, version, w, h, fx, fy, cx, cy, depth_scale = hs
            if magic != _MAGIC or version not in (1, _VERSION):
                raise ConnectionError(f"bad live handshake: {magic} v{version}")
            with self._cv:
                self._cam = CameraModel(
                    width=w, height=h, fx=fx, fy=fy, cx=cx, cy=cy
                )
                self._cv.notify_all()
            while True:
                hdr = conn.recv(1)
                if not hdr:
                    break  # clean EOF
                hdr += _recv_exact(conn, _FRAME_HDR.size - 1)
                tag, ts, flags, dn, rn = _FRAME_HDR.unpack(hdr)
                if tag != _FRAME:
                    raise ConnectionError("live stream desynchronised")
                gt_pose = None
                if flags & FLAG_POSE:
                    tx, ty, tz, qx, qy, qz, qw = _POSE.unpack(
                        _recv_exact(conn, _POSE.size)
                    )
                    gt_pose = np.eye(4)
                    gt_pose[:3, :3] = _quat_to_mat(qx, qy, qz, qw)
                    gt_pose[:3, 3] = (tx, ty, tz)
                dpay = _recv_exact(conn, dn)
                rpay = _recv_exact(conn, rn)
                if flags & FLAG_ZLIB:
                    dpay = zlib.decompress(dpay)
                    rpay = zlib.decompress(rpay)
                depth = (
                    np.frombuffer(dpay, np.uint16).reshape(h, w).astype(np.float32)
                    * depth_scale
                )
                rgb = np.frombuffer(rpay, np.uint8).reshape(h, w, 3)
                with self._cv:
                    if len(self._buf) == self._buf.maxlen:
                        self.dropped += 1
                    if gt_pose is not None:
                        if self._gt_first is None:
                            self._gt_first = gt_pose
                        self._gt[ts] = gt_pose
                    self._buf.append(
                        FrameData(
                            rgb=rgb, depth=depth, timestamp=ts, gt_pose=gt_pose
                        )
                    )
                    self._cv.notify_all()
        except (OSError, ConnectionError):
            pass
        finally:
            with self._cv:
                self._eof = True
                self._cv.notify_all()

    # -- consumer side --------------------------------------------------------

    def intrinsics(self) -> Optional[CameraModel]:
        """Blocks until the producer's handshake arrives (camera_info)."""
        with self._cv:
            self._cv.wait_for(
                lambda: self._cam is not None or self._eof, timeout=self.timeout
            )
            return self._cam

    def __len__(self) -> int:
        return 0  # unbounded (matches the reference's live readers)

    def next_frame(self, latest: bool = True) -> Optional[FrameData]:
        """Newest frame (drops older queued ones), or None at stream end."""
        with self._cv:
            ok = self._cv.wait_for(
                lambda: self._buf or self._eof, timeout=self.timeout
            )
            if not ok or (not self._buf and self._eof):
                return None
            if latest:
                self.dropped += max(0, len(self._buf) - 1)
                frame = self._buf[-1]
                self._buf.clear()
            else:
                frame = self._buf.popleft()
            return frame

    def __iter__(self) -> Iterator[FrameData]:
        while True:
            f = self.next_frame(latest=True)
            if f is None:
                return
            yield f

    def get_incremental_transformation(self, timestamp: int):
        """GT pose at `timestamp` relative to the FIRST received GT pose, or
        None if the producer sends no pose channel.

        == the reference live reader's tf ground truth (RosNodeReader.cpp:
        142-165 / RosBagReader.cpp:172-184: root->camera tf relative to the
        first frame's), which feeds '-init tf' live."""
        with self._cv:
            T = self._gt.get(timestamp)
            first = self._gt_first
        if T is None or first is None:
            return None
        return (np.linalg.inv(first) @ T).astype(np.float32)

    def close(self):
        try:
            self._srv.close()
        except OSError:
            pass


def publish_frames(
    frames: Iterable[FrameData],
    cam: CameraModel,
    port: int,
    host: str = "127.0.0.1",
    depth_scale: float = 0.001,
    compress: bool = False,
) -> int:
    """Producer helper: stream FrameData to a LiveSocketReader. Returns the
    number of frames sent. Bridges (a ROS node, a camera daemon) implement
    this same wire format in their own language."""
    sent = 0
    with socket.create_connection((host, port)) as s:
        s.sendall(
            _HANDSHAKE.pack(
                _MAGIC, _VERSION, cam.width, cam.height,
                cam.fx, cam.fy, cam.cx, cam.cy, depth_scale,
            )
        )
        for f in frames:
            flags = FLAG_ZLIB if compress else 0
            pose_payload = b""
            if getattr(f, "gt_pose", None) is not None:
                flags |= FLAG_POSE
                T = np.asarray(f.gt_pose, np.float64)
                qx, qy, qz, qw = _mat_to_quat(T[:3, :3])
                pose_payload = _POSE.pack(
                    T[0, 3], T[1, 3], T[2, 3], qx, qy, qz, qw
                )
            depth_mm = np.rint(
                np.clip(np.nan_to_num(f.depth) / depth_scale, 0, 65535)
            ).astype(np.uint16)
            dpay = depth_mm.tobytes()
            rpay = np.ascontiguousarray(f.rgb, dtype=np.uint8).tobytes()
            if compress:
                dpay = zlib.compress(dpay, 1)
                rpay = zlib.compress(rpay, 1)
            s.sendall(
                _FRAME_HDR.pack(_FRAME, int(f.timestamp), flags,
                                len(dpay), len(rpay))
                + pose_payload
            )
            s.sendall(dpay)
            s.sendall(rpay)
            sent += 1
    return sent
