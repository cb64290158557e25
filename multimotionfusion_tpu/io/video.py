"""Video-URI frame source: the reference's PangolinReader slot.

The reference opens a Pangolin video URI carrying TWO streams — 16-bit
single-channel depth and 8-bit 3-channel RGB — rescales both to the working
resolution and converts depth to metres at 1 mm resolution
(GUI/Tools/PangolinReader.cpp:20-75). Pangolin's URI layer multiplexes
files, image-sequence patterns and camera devices behind that interface.

The TPU build keeps the same contract on OpenCV's capture layer instead:

    video:<depth_src>;<rgb_src>

where each <src> is anything ``cv2.VideoCapture`` accepts — a video file, an
image-sequence pattern (``depth_%06d.png``), a V4L2 device index (``0``) or a
network stream URI. The two captures are stepped in lockstep (the reference's
two streams arrive in one buffer; two captures of equal length are the
container-less equivalent). Depth sources must decode to 16-bit
single-channel (millimetres), mirroring the reference's stream check
(PangolinReader.cpp:24-27); RGB sources to 8-bit 3-channel. Both are resized
to the working resolution when they differ (resampleDepth / resampleRgb,
PangolinReader.cpp:38-47).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from multimotionfusion_tpu.io.frame import FrameData
from multimotionfusion_tpu.io.readers import LogReader


class VideoLogReader(LogReader):
    def __init__(self, uri: str, width: int = 640, height: int = 480,
                 flip_colors: bool = True, fps: float = 30.0):
        import cv2  # noqa: F401 — hard dependency of this reader only

        self._cv2 = cv2
        spec = uri[6:] if uri.startswith("video:") else uri
        parts = spec.split(";")
        if len(parts) != 2:
            raise ValueError(
                "video URI needs two sources 'video:<depth>;<rgb>' "
                f"(got {uri!r}); the reference requires a depth stream too "
                "(PangolinReader.cpp:24-27)"
            )
        self._depth_src, self._rgb_src = parts
        self.width, self.height = width, height
        self.flip_colors = flip_colors
        self.fps = fps  # timestamp fallback clock when POS_MSEC is absent
        self._len: Optional[int] = None
        # fail fast on a typo'd sequence pattern / missing file (the
        # reference errors on a malformed URI at construction,
        # PangolinReader.cpp:20-27); live device indices are exempt
        for src, rgb in ((self._depth_src, False), (self._rgb_src, True)):
            if not src.isdigit():
                self._open(src, convert_rgb=rgb).release()

    def _open(self, src: str, convert_rgb: bool):
        cv2 = self._cv2
        if src.isdigit():
            cap = cv2.VideoCapture(int(src))
        elif "%" in src:
            # image-sequence patterns must use the imread-backed CAP_IMAGES
            # backend: the ffmpeg path converts 16-bit gray to 8UC1
            cap = cv2.VideoCapture(src, cv2.CAP_IMAGES)
        else:
            cap = cv2.VideoCapture(src)
        if not cap.isOpened():
            raise IOError(f"cannot open video source {src!r}")
        # 16-bit depth must come through unconverted (no BGR mangling)
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 1.0 if convert_rgb else 0.0)
        return cap

    def __len__(self) -> int:  # live devices report 0 like the reference
        if self._depth_src.isdigit():
            return 0  # never re-open a camera device just to ask its length
        if self._len is None:
            cv2 = self._cv2
            cap = self._open(self._depth_src, convert_rgb=False)
            self._len = max(int(cap.get(cv2.CAP_PROP_FRAME_COUNT)), 0)
            cap.release()
        return self._len

    def intrinsics(self) -> Optional["CameraModel"]:  # noqa: F821
        return None  # video URIs carry no calibration; '-cal' supplies it

    def __iter__(self) -> Iterator[FrameData]:
        cv2 = self._cv2
        dcap = self._open(self._depth_src, convert_rgb=False)
        ccap = self._open(self._rgb_src, convert_rgb=True)
        i = 0
        try:
            while True:
                okd, depth = dcap.read()
                okc, rgb = ccap.read()
                if not (okd and okc):
                    if okd != okc:  # one stream ran dry before the other
                        import warnings

                        short = "rgb" if okd else "depth"
                        warnings.warn(
                            f"video streams have different lengths: {short} "
                            f"stream ended at frame {i}; truncating "
                            "(check the two sources match)",
                            stacklevel=2,
                        )
                    return  # either stream ending ends the log
                if depth.ndim == 3:
                    depth = depth[..., 0]
                if depth.dtype != np.uint16:
                    raise ValueError(
                        f"depth stream must be 16-bit mono, got {depth.dtype}"
                        " (PangolinReader.cpp:24-27)"
                    )
                if rgb.ndim != 3 or rgb.dtype != np.uint8:
                    raise ValueError("rgb stream must be 8-bit 3-channel")
                if depth.shape[:2] != (self.height, self.width):
                    depth = cv2.resize(
                        depth, (self.width, self.height),
                        interpolation=cv2.INTER_NEAREST,
                    )
                if rgb.shape[:2] != (self.height, self.width):
                    rgb = cv2.resize(rgb, (self.width, self.height))
                if self.flip_colors:  # cv2 decodes BGR
                    rgb = rgb[..., ::-1]
                # CAP_IMAGES always reports POS_MSEC=-1; fall back to a
                # synthetic fps clock in NANOSECONDS like ImageLogReader /
                # SyntheticLogReader (raw frame indices would stall -rt
                # pacing and collapse ns-keyed GT association)
                ts = dcap.get(cv2.CAP_PROP_POS_MSEC)
                yield FrameData(
                    rgb=np.ascontiguousarray(rgb),
                    depth=depth.astype(np.float32) * 1e-3,
                    timestamp=int(ts * 1e6) if ts > 0
                    else int(i / self.fps * 1e9),
                    name=f"video-{i:06d}",
                )
                i += 1
        finally:
            dcap.release()
            ccap.release()
