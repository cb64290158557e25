"""Honest per-frame cost of the batched static path on the real TPU:
chained _frame_steps_batch dispatches (state feeds forward), with and
without upload overlap, vs the single-step program.

Usage: python tools/profile_batch.py [--frames 60] [--batch 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from multimotionfusion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--batch", type=int, default=10)
    args = ap.parse_args()

    from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
    from multimotionfusion_tpu.engine import MultiMotionFusionTPU
    from multimotionfusion_tpu.io.readers import SyntheticLogReader

    cam = CameraModel()
    cfg = EngineConfig(
        camera=cam, enable_multi_model=False, odom_init="",
        surfels=SurfelConfig(max_surfels=1 << 20),
    )
    warm = 16
    n = warm + args.frames
    reader = SyntheticLogReader(
        cam, num_frames=n, cam_step=(0.004, 0.0, 0.0),
        cam_rot_step=(0.0, 0.002, 0.0),
    )
    frames = list(reader)
    engine = MultiMotionFusionTPU(cfg)
    for f in frames[:6]:
        engine.process_frame(f)
    for i in range(6, warm, args.batch):
        engine.process_frames(frames[i : i + args.batch])
    engine.finish()

    # 1. batched, uploads overlapped (the bench pattern)
    chunks = [
        frames[i : i + args.batch]
        for i in range(warm, n, args.batch)
    ]
    handle = engine.upload_batch(chunks[0])
    t0 = time.time()
    for i, c in enumerate(chunks):
        nxt = engine.upload_batch(chunks[i + 1]) if i + 1 < len(chunks) else None
        engine.process_frames(handle)
        handle = nxt
    engine.finish()
    dt = time.time() - t0
    print(f"batched+overlap: {dt / args.frames * 1e3:.2f} ms/frame "
          f"({args.frames / dt:.2f} fps)")

    # 2. batched, uploads inline (serialised)
    engine2 = MultiMotionFusionTPU(cfg)
    for f in frames[:6]:
        engine2.process_frame(f)
    for i in range(6, warm, args.batch):
        engine2.process_frames(frames[i : i + args.batch])
    engine2.finish()
    t0 = time.time()
    for c in chunks:
        engine2.process_frames(c)
    engine2.finish()
    dt = time.time() - t0
    print(f"batched inline:  {dt / args.frames * 1e3:.2f} ms/frame")

    # 3. upload cost alone
    t0 = time.time()
    handles = [engine.upload_batch(c, background=False) for c in chunks]
    dt = time.time() - t0
    print(f"upload alone:    {dt / args.frames * 1e3:.2f} ms/frame")
    del handles


if __name__ == "__main__":
    main()
