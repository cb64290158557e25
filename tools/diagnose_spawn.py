"""Diagnose the bench's multi-model warmup: why fewer than 5 movers are
active at the end of warmup (VERDICT r4 ask #2).

Replicates bench.bench_multi_model's exact frame stream + batching (so the
persistent compile cache serves the same programs), then prints every
frame's lifecycle stats: spawn flag, active count, per-segment pixel
counts. Run on the TPU (or CPU with MMF_DIAG_CPU=1 at reduced scale).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("MMF_DIAG_CPU") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"

from multimotionfusion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main(n_objects: int = 5, extra: int = 15):
    from multimotionfusion_tpu.config import (
        CameraModel, EngineConfig, SurfelConfig,
    )
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
    # keep in lockstep with bench.bench_multi_model's scene
    centres = [
        np.array([-0.62, -0.18, 1.65]),
        np.array([0.62, -0.18, 1.65]),
        np.array([-0.4, 0.4, 1.6]),
        np.array([0.4, 0.4, 1.6]),
        np.array([0.0, -0.45, 1.7]),
    ][:n_objects]
    radius = 0.26
    orbit_r, omega = 0.12, 0.12
    warmup = 8 + 4 * n_objects
    n_frames = warmup + extra
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
    batch = 5
    engine.process_frame(frames[0])

    def report(t0):
        s = np.asarray(engine._stats_dev[-1])
        if s.ndim == 1:
            s = s[None]
        for r, row in enumerate(s):
            segpx = row[9:].astype(int)
            print(
                f"f{t0 + r:3d} spawn={int(row[6])} active={int(row[7])} "
                f"alive={int(row[4])} hwm={int(row[5])} "
                f"seg_px={list(segpx)}"
            )

    t = 1
    for i in range(1, warmup, batch):
        engine.process_frames(frames[i : i + batch])
        engine.finish()
        report(t)
        t += len(frames[i : i + batch])
    print(f"-- end of warmup: active="
          f"{int(np.sum(np.asarray(engine.mstate.objects.active)))} "
          f"stored={np.asarray(engine.mstate.objects.stored).tolist()} "
          f"unseen={np.asarray(engine.mstate.objects.unseen).tolist()}")
    for i in range(warmup, n_frames, batch):
        engine.process_frames(frames[i : i + batch])
        engine.finish()
        report(t)
        t += len(frames[i : i + batch])
    print(f"-- final active="
          f"{int(np.sum(np.asarray(engine.mstate.objects.active)))}")


if __name__ == "__main__":
    main()
