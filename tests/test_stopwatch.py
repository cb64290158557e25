"""Stopwatch profiler: wire-format parity + engine integration."""

import socket
import struct

import numpy as np

from multimotionfusion_tpu.utils.stopwatch import Stopwatch


def _parse_packet(buf: bytes):
    (size,) = struct.unpack_from("<i", buf, 0)
    assert size == len(buf)
    (sig,) = struct.unpack_from("<Q", buf, 4)
    out = {}
    off = 12
    while off < len(buf):
        end = buf.index(b"\0", off)
        name = buf[off:end].decode()
        (ms,) = struct.unpack_from("<f", buf, end + 1)
        out[name] = ms
        off = end + 5
    return sig, out


def test_serialise_roundtrip():
    sw = Stopwatch()
    sw.set_custom_signature(1234)
    sw.add_timing("stage_a", 12.5)
    sw.add_timing("stage_b", 3.25)
    sig, timings = _parse_packet(sw.serialise())
    assert sig == 1234
    assert timings["stage_a"] == 12.5
    assert timings["stage_b"] == 3.25


def test_tick_tock_and_udp():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    sw = Stopwatch(addr=rx.getsockname())
    sw.tick("work")
    sw.tock("work")
    sw._last_send = 0.0  # force immediate send
    sw.send_all()
    sig, timings = _parse_packet(rx.recv(65536))
    assert "work" in timings and timings["work"] >= 0.0
    rx.close()


def test_engine_records_run_timer():
    from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
    from multimotionfusion_tpu.engine import MultiMotionFusionTPU
    from multimotionfusion_tpu.io.readers import SyntheticLogReader

    cam = CameraModel(width=80, height=60, fx=66.0, fy=66.0, cx=40.0, cy=30.0)
    cfg = EngineConfig(camera=cam, enable_multi_model=False, odom_init="",
                       surfels=SurfelConfig(max_surfels=16384, depth_cutoff=5.0))
    engine = MultiMotionFusionTPU(cfg)
    for f in SyntheticLogReader(cam, num_frames=2):
        engine.process_frame(f)
    assert "Run" in Stopwatch.get().timings
    assert Stopwatch.get().timings["Run"] >= 0.0
