"""TICK/TOCK section profiler with the reference's UDP wire protocol.

== reference Core/Utils/Stopwatch.h: a process-wide singleton that stores the
last duration of each named section (milliseconds) and periodically serialises
the map to a UDP datagram on 127.0.0.1:45454 for the external StopwatchViewer
— wire format [int32 packet_size][uint64 signature] then repeated
[name\\0][float32 ms] (Stopwatch.h:140-161). Byte-compatible, so the
reference's viewer works unmodified against this engine.

For device work, prefer wrapping whole jitted steps (a TICK inside device code
would only measure dispatch); `jax.profiler.trace` is the in-kernel
counterpart for per-op device timelines.
"""

from __future__ import annotations

import socket
import struct
import time
from contextlib import contextmanager
from typing import Dict

SEND_INTERVAL_US = 10_000


class Stopwatch:
    _instance = None

    @classmethod
    def get(cls) -> "Stopwatch":
        if cls._instance is None:
            cls._instance = Stopwatch()
        return cls._instance

    def __init__(self, addr=("127.0.0.1", 45454)):
        self.timings: Dict[str, float] = {}
        self._tick: Dict[str, float] = {}
        self.signature = int(time.time() * 1e6)
        self.addr = addr
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._last_send = time.time() * 1e6

    def set_custom_signature(self, sig: int):
        self.signature = sig

    def tick(self, name: str):
        self._tick[name] = time.perf_counter()

    def tock(self, name: str):
        start = self._tick.get(name)
        if start is not None:
            ms = (time.perf_counter() - start) * 1000.0
            if ms > 0:
                self.timings[name] = ms

    def pulse(self, name: str):
        self.timings[name] = 1.0

    def add_timing(self, name: str, ms: float):
        if ms > 0:
            self.timings[name] = ms

    def serialise(self) -> bytes:
        body = b""
        for name, ms in sorted(self.timings.items()):
            body += name.encode() + b"\x00" + struct.pack("<f", ms)
        size = 4 + 8 + len(body)
        return struct.pack("<iQ", size, self.signature) + body

    def send_all(self):
        now = time.time() * 1e6
        if now - self._last_send > SEND_INTERVAL_US:
            try:
                self._sock.sendto(self.serialise(), self.addr)
            except OSError:
                pass
            self._last_send = now

    def print_all(self):
        for name, ms in sorted(self.timings.items()):
            print(f"{name}: {ms:.3f}ms")


@contextmanager
def section(name: str):
    """`with section("odom"):` == TICK(name) ... TOCK(name)."""
    sw = Stopwatch.get()
    sw.tick(name)
    try:
        yield
    finally:
        sw.tock(name)


def TICK(name: str):
    Stopwatch.get().tick(name)


def TOCK(name: str):
    Stopwatch.get().tock(name)
