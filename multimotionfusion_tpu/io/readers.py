"""Frame sources: log readers.

TPU-build counterpart of the reference GUI/Tools LogReader hierarchy
(GUI/Tools/LogReader.h:26-75). Implemented here:

- ``KlgLogReader``: .klg binary logs — int32 frame count header, then per
  frame [int64 timestamp, int32 depth_size, int32 rgb_size, depth bytes
  (zlib'd uint16 mm or raw), rgb bytes (jpeg or raw BGR)]
  (GUI/Tools/KlgLogReader.cpp:59-90).
- ``ImageLogReader``: image-directory logs (Color####.png + Depth####.exr
  [+ Mask####.png]) (GUI/Tools/ImageLogReader.{h,cpp}); the reference's
  background buffering thread is unnecessary here — decode is overlapped with
  device compute by the engine's async dispatch.
- ``SyntheticLogReader``: procedurally rendered sequence with ground-truth
  trajectory, for tests/benchmarks (no counterpart in the reference, which
  relied on recorded bags — SURVEY.md §4).

ROS1 bag playback lives in ``multimotionfusion_tpu.io.rosbag`` (pure-Python
bag/message parsing, no ROS install needed).
"""

from __future__ import annotations

import glob
import os
import re
import struct
import zlib
from typing import Iterator, Optional

import numpy as np

from multimotionfusion_tpu.config import CameraModel
from multimotionfusion_tpu.io.frame import FrameData


class LogReader:
    """Iterator over FrameData (reference LogReader.h API, minus GL specifics)."""

    def __iter__(self) -> Iterator[FrameData]:
        raise NotImplementedError

    def __len__(self) -> int:
        raise NotImplementedError

    def intrinsics(self) -> Optional[CameraModel]:
        """Calibration carried by the log, if any (hasIntrinsics)."""
        return None


class KlgLogReader(LogReader):
    def __init__(self, path: str, width: int = 640, height: int = 480, flip_colors=True):
        self.path = path
        self.width, self.height = width, height
        self.flip_colors = flip_colors  # klg stores BGR; we standardise on RGB
        with open(path, "rb") as f:
            (self.num_frames,) = struct.unpack("<i", f.read(4))

    def __len__(self) -> int:
        return self.num_frames

    def __iter__(self) -> Iterator[FrameData]:
        # prefer the native prefetching decoder (native/klg_loader.cpp)
        from multimotionfusion_tpu.io import native

        if native.available():
            reader = native.NativeKlgReader(self.path, self.width, self.height)
            try:
                for i, (ts, depth, rgb) in enumerate(reader.frames()):
                    yield FrameData(rgb=rgb, depth=depth, timestamp=ts, name=str(i))
            finally:
                reader.close()
            return
        yield from self._iter_python()

    def _iter_python(self) -> Iterator[FrameData]:
        import cv2

        n_pix = self.width * self.height
        with open(self.path, "rb") as f:
            f.read(4)
            for i in range(self.num_frames):
                hdr = f.read(16)
                if len(hdr) < 16:
                    return
                ts, depth_size, rgb_size = struct.unpack("<qii", hdr)
                depth_bytes = f.read(depth_size)
                rgb_bytes = f.read(rgb_size) if rgb_size > 0 else b""
                if depth_size != n_pix * 2:
                    depth_bytes = zlib.decompress(depth_bytes, bufsize=n_pix * 2)
                depth_mm = np.frombuffer(depth_bytes, np.uint16).reshape(
                    self.height, self.width
                )
                depth = depth_mm.astype(np.float32) * 0.001
                if rgb_size == 0:
                    rgb = np.zeros((self.height, self.width, 3), np.uint8)
                elif rgb_size != n_pix * 3:
                    rgb = cv2.imdecode(
                        np.frombuffer(rgb_bytes, np.uint8), cv2.IMREAD_COLOR
                    )
                else:
                    rgb = np.frombuffer(rgb_bytes, np.uint8).reshape(
                        self.height, self.width, 3
                    )
                if self.flip_colors:
                    rgb = rgb[..., ::-1]
                yield FrameData(
                    rgb=np.ascontiguousarray(rgb), depth=depth,
                    timestamp=ts, name=str(i),
                )


class ImageLogReader(LogReader):
    def __init__(
        self,
        directory: str,
        color_prefix: str = "Color",
        depth_prefix: str = "Depth",
        mask_prefix: str = "Mask",
        fps: float = 30.0,
        depth_dir: Optional[str] = None,  # '-depthdir' (defaults to directory)
        mask_dir: Optional[str] = None,  # '-maskdir'
        mask_stop_frame: Optional[int] = None,  # '-nm': ignore masks from here
    ):
        self.dir = directory
        self.depth_dir = depth_dir or directory
        self.mask_dir = mask_dir or directory
        self.mask_stop_frame = mask_stop_frame
        self.fps = fps
        self.color_prefix, self.depth_prefix, self.mask_prefix = (
            color_prefix, depth_prefix, mask_prefix,
        )
        pat = re.compile(re.escape(color_prefix) + r"(\d+)\.(png|jpg|jpeg)$")
        self.indices = sorted(
            m.group(1)
            for p in glob.glob(os.path.join(directory, f"{color_prefix}*"))
            if (m := pat.search(os.path.basename(p)))
        )
        if not self.indices:
            raise FileNotFoundError(f"no {color_prefix}*.png in {directory}")

    def __len__(self) -> int:
        return len(self.indices)

    def _find(self, prefix: str, idx: str, exts, base=None) -> Optional[str]:
        for ext in exts:
            p = os.path.join(base or self.dir, f"{prefix}{idx}.{ext}")
            if os.path.exists(p):
                return p
        return None

    def __iter__(self) -> Iterator[FrameData]:
        import cv2

        for i, idx in enumerate(self.indices):
            cpath = self._find(self.color_prefix, idx, ("png", "jpg", "jpeg"))
            dpath = self._find(
                self.depth_prefix, idx, ("exr", "png"), self.depth_dir
            )
            bgr = cv2.imread(cpath, cv2.IMREAD_COLOR)
            if dpath and dpath.endswith(".exr"):
                depth = cv2.imread(dpath, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_ANYCOLOR)
                if depth is not None and depth.ndim == 3:
                    depth = depth[..., 0]
            else:
                d16 = cv2.imread(dpath, cv2.IMREAD_ANYDEPTH)
                depth = d16.astype(np.float32) * 0.001  # 16-bit png in mm
            mask = None
            if self.mask_stop_frame is None or i < self.mask_stop_frame:
                mpath = self._find(
                    self.mask_prefix, idx, ("png", "pgm"), self.mask_dir
                )
                if mpath:
                    mask = cv2.imread(mpath, cv2.IMREAD_GRAYSCALE)
            yield FrameData(
                rgb=np.ascontiguousarray(bgr[..., ::-1]),
                depth=np.asarray(depth, np.float32),
                timestamp=int(i / self.fps * 1e9),
                mask=mask,
                name=idx,
            )


class PrefetchReader(LogReader):
    """Decode frames on a background thread, a bounded queue ahead.

    == the reference ImageLogReader's buffering thread (ImageLogReader.cpp:
    `bufferImages` on a std::thread; the frame loop consumes from the ring):
    PNG/EXR/JPEG decode otherwise serialises with the engine's host work.
    Wraps ANY inner reader; iteration order and contents are unchanged.
    Decode errors surface on the consumer side at the failing frame.
    """

    def __init__(self, inner: LogReader, depth: int = 4):
        self.inner = inner
        self.depth = depth

    def __len__(self) -> int:
        return len(self.inner)

    def intrinsics(self) -> Optional[CameraModel]:
        return self.inner.intrinsics()

    def get_incremental_transformation(self, ts):
        fn = getattr(self.inner, "get_incremental_transformation", None)
        return fn(ts) if fn else None

    def __iter__(self) -> Iterator[FrameData]:
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=self.depth)
        _END = object()

        def pump():
            try:
                for f in self.inner:
                    q.put(f)
                q.put(_END)
            except BaseException as e:  # propagate decode errors to consumer
                q.put(e)

        t = threading.Thread(target=pump, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


class SyntheticLogReader(LogReader):
    """Procedural RGB-D sequence with known camera (and object) trajectory."""

    def __init__(
        self,
        cam: CameraModel,
        num_frames: int = 30,
        cam_step=(0.004, 0.0, 0.0),
        cam_rot_step=(0.0, 0.002, 0.0),
        object_step=(0.0, 0.0, 0.0),
        fps: float = 30.0,
    ):
        from multimotionfusion_tpu.io import synthetic

        self._render = synthetic.render_moving_sphere
        self.cam = cam
        self.num_frames = num_frames
        self.cam_step = np.asarray(cam_step, np.float64)
        self.cam_rot_step = np.asarray(cam_rot_step, np.float64)
        self.object_step = np.asarray(object_step, np.float64)
        self.fps = fps
        self.gt_poses: list[np.ndarray] = []

    def __len__(self) -> int:
        return self.num_frames

    def __iter__(self) -> Iterator[FrameData]:
        from multimotionfusion_tpu.io.synthetic import pose as mk_pose

        for i in range(self.num_frames):
            T_wc = mk_pose(rotvec=self.cam_rot_step * i, trans=self.cam_step * i)
            self.gt_poses.append(T_wc)
            depth, rgb = self._render(T_wc, self.cam, self.object_step * i)
            yield FrameData(
                rgb=rgb.astype(np.uint8),
                depth=depth,
                timestamp=int(i / self.fps * 1e9),
                name=f"synthetic-{i}",
            )


class SlicedLogReader(LogReader):
    """Start/stop/stride view over another reader ('-s', '-e', '-skip')."""

    def __init__(self, inner: LogReader, start: int = 0,
                 end: Optional[int] = None, stride: int = 1):
        self.inner = inner
        self.start = start
        self.end = end if end is not None else len(inner)
        self.stride = max(stride, 1)

    def __len__(self) -> int:
        n = max(min(self.end, len(self.inner)) - self.start, 0)
        return -(-n // self.stride)

    def intrinsics(self) -> Optional[CameraModel]:
        return self.inner.intrinsics()

    def get_incremental_transformation(self, ts):
        fn = getattr(self.inner, "get_incremental_transformation", None)
        return fn(ts) if fn else None

    def __iter__(self) -> Iterator[FrameData]:
        for i, f in enumerate(self.inner):
            if i < self.start or i >= self.end:
                continue
            if (i - self.start) % self.stride == 0:
                yield f


def open_log(uri: str, cam: Optional[CameraModel] = None) -> LogReader:
    """Reader selection (reference MainController.cpp:185-305)."""
    if uri.startswith("live:"):
        # live RGB-D over TCP (the LiveLogReader/RosNodeReader transport
        # slot): "live:<port>" listens locally; "live://host:port" too —
        # the reader always LISTENS, producers connect and push.
        from multimotionfusion_tpu.io.live import LiveSocketReader

        spec = uri[5:].lstrip("/")
        host, _, port = spec.rpartition(":")
        return LiveSocketReader(port=int(port or spec or 0),
                                host=host or "127.0.0.1")
    if uri.startswith("video:"):
        # video URIs (the PangolinReader slot): "video:<depth_src>;<rgb_src>"
        from multimotionfusion_tpu.io.video import VideoLogReader

        c = cam or CameraModel()
        return VideoLogReader(uri, c.width, c.height)
    if uri.endswith(".klg"):
        c = cam or CameraModel()
        return KlgLogReader(uri, c.width, c.height)
    if uri.endswith(".bag"):
        from multimotionfusion_tpu.io.rosbag import RosBagReader

        dims = (cam.width, cam.height) if cam is not None else None
        return RosBagReader(uri, target_dimensions=dims)
    if uri == "synthetic":
        return SyntheticLogReader(cam or CameraModel())
    if os.path.isdir(uri):
        return ImageLogReader(uri)
    raise ValueError(f"unrecognised log source: {uri}")
