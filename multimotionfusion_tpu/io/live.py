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
                depth payload (u16 millimetres, optionally zlib: flags & 1)
                rgb payload   (u8 RGB interleaved, optionally zlib: flags & 1)

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
_VERSION = 1
_HANDSHAKE = struct.Struct("<4sIII5f")
_FRAME_HDR = struct.Struct("<4sqBII")


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
            if magic != _MAGIC or version != _VERSION:
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
                dpay = _recv_exact(conn, dn)
                rpay = _recv_exact(conn, rn)
                if flags & 1:
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
                    self._buf.append(FrameData(rgb=rgb, depth=depth, timestamp=ts))
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
        flags = 1 if compress else 0
        for f in frames:
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
            )
            s.sendall(dpay)
            s.sendall(rpay)
            sent += 1
    return sent
