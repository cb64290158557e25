"""Phase-split timings of the EXACT bench configurations.

Replicates bench.py's static and multi-model runs (same configs, same cached
programs) but splits each trial's wall-clock into upload / dispatch / device
phases, answering 'where does the frame budget actually go?' on the
tunnelled TPU.

Usage: python tools/profile_e2e.py [--mode static|multi|both]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimotionfusion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def static_phases(trials=3, per_trial=20, batch=10):
    import jax

    from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
    from multimotionfusion_tpu.engine import MultiMotionFusionTPU
    from multimotionfusion_tpu.io.readers import SyntheticLogReader

    cam = CameraModel()
    cfg = EngineConfig(
        camera=cam,
        enable_multi_model=False,
        odom_init="",
        surfels=SurfelConfig(max_surfels=1 << 20),
    )
    warmup = 16
    n_frames = warmup + trials * per_trial
    reader = SyntheticLogReader(
        cam, num_frames=n_frames, cam_step=(0.004, 0.0, 0.0),
        cam_rot_step=(0.0, 0.002, 0.0),
    )
    frames = list(reader)
    engine = MultiMotionFusionTPU(cfg)
    for f in frames[:6]:
        engine.process_frame(f)
    for i in range(6, warmup, 10):
        engine.process_frames(frames[i : i + 10])
    engine.finish()

    print("== static ==")
    pos = warmup
    for t in range(trials):
        chunk = frames[pos : pos + per_trial]
        pos += per_trial
        batches = [chunk[i : i + batch] for i in range(0, len(chunk), batch)]
        # phase 1: upload everything SYNCHRONOUSLY (normally overlapped)
        t0 = time.perf_counter()
        handles = [engine.upload_batch(b, background=False) for b in batches]
        t_upload = time.perf_counter() - t0
        # phase 2: dispatch all batches (async returns)
        t0 = time.perf_counter()
        for h in handles:
            engine.process_frames(h)
        t_dispatch = time.perf_counter() - t0
        # phase 3: block for the device
        t0 = time.perf_counter()
        engine.finish()
        t_block = time.perf_counter() - t0
        tot = t_upload + t_dispatch + t_block
        print(
            f"trial {t}: upload {t_upload*1e3:7.1f} ms  dispatch "
            f"{t_dispatch*1e3:7.1f} ms  device-wait {t_block*1e3:7.1f} ms  "
            f"-> {per_trial/tot:5.1f} fps serial, "
            f"{per_trial/max(t_dispatch+t_block, t_upload):5.1f} fps overlapped"
        )


def multi_phases(n_objects=5, trials=3, per_trial=15, batch=5):
    import jax

    from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
    from multimotionfusion_tpu.engine import MultiMotionFusionTPU
    from multimotionfusion_tpu.io import synthetic
    from multimotionfusion_tpu.io.frame import FrameData

    cam = CameraModel()
    cfg = EngineConfig(
        camera=cam,
        enable_multi_model=True,
        object_slots=n_objects,
        object_capacity=1 << 16,
        surfels=SurfelConfig(max_surfels=1 << 19),
        model_spawn_offset=4,
        upload_yuv420=False,
        upload_depth_mm=False,
    )
    centres = [
        np.array([-0.62, -0.18, 1.65]),
        np.array([0.62, -0.18, 1.65]),
        np.array([-0.4, 0.4, 1.6]),
        np.array([0.4, 0.4, 1.6]),
        np.array([0.0, -0.45, 1.7]),
    ][:n_objects]
    radius = 0.24
    orbit_r, omega = 0.12, 0.12
    warmup = 8 + 4 * n_objects
    n_frames = warmup + trials * per_trial
    frames = []
    for i in range(n_frames):
        th = omega * i
        spheres = [
            (
                tuple(
                    c + orbit_r * np.array(
                        [np.cos(th + k * 1.3), np.sin(th + k * 1.3), 0.0]
                    )
                ),
                radius,
            )
            for k, c in enumerate(centres)
        ]
        depth, rgb = synthetic.render(
            np.eye(4, dtype=np.float32), cam, spheres=spheres
        )
        frames.append(
            FrameData(rgb=rgb.astype(np.uint8), depth=depth,
                      timestamp=int(i / 30 * 1e9))
        )

    engine = MultiMotionFusionTPU(cfg)
    engine.process_frame(frames[0])
    for i in range(1, warmup, batch):
        engine.process_frames(frames[i : i + batch])
    engine.finish()
    print("== multi ==")
    print("active after warmup:",
          int(np.sum(np.asarray(engine.mstate.objects.active))))

    pos = warmup
    for t in range(trials):
        chunk = frames[pos : pos + per_trial]
        pos += per_trial
        batches = [chunk[i : i + batch] for i in range(0, len(chunk), batch)]
        t0 = time.perf_counter()
        handles = [engine.upload_batch(b, background=False) for b in batches]
        t_upload = time.perf_counter() - t0
        t0 = time.perf_counter()
        for h in handles:
            engine.process_frames(h)
        t_dispatch = time.perf_counter() - t0
        t0 = time.perf_counter()
        engine.finish()
        t_block = time.perf_counter() - t0
        tot = t_upload + t_dispatch + t_block
        act = int(np.sum(np.asarray(engine.mstate.objects.active)))
        print(
            f"trial {t}: upload {t_upload*1e3:7.1f} ms  dispatch "
            f"{t_dispatch*1e3:7.1f} ms  device-wait {t_block*1e3:7.1f} ms  "
            f"-> {per_trial/tot:5.1f} fps serial, "
            f"{per_trial/max(t_dispatch+t_block, t_upload):5.1f} fps "
            f"overlapped  active={act}"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["static", "multi", "both"])
    args = ap.parse_args()
    if args.mode in ("static", "both"):
        static_phases()
    if args.mode in ("multi", "both"):
        multi_phases()


if __name__ == "__main__":
    main()
