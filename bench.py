"""End-to-end benchmark: static-mode SLAM FPS at 640x480 on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's real-time budget of 30 FPS at 640x480 on an NVIDIA
GPU (BASELINE.md; reference GUI/MainController.cpp:614-617 frame-skip policy).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    import numpy as np

    from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
    from multimotionfusion_tpu.engine import MultiMotionFusionTPU
    from multimotionfusion_tpu.io.readers import SyntheticLogReader

    cam = CameraModel()  # 640x480 production shape
    cfg = EngineConfig(
        camera=cam,
        enable_multi_model=False,
        odom_init="",  # "-static" = ElasticFusion mode: dense tracking only
        surfels=SurfelConfig(max_surfels=1 << 20),
    )
    n_frames = 25
    warmup = 5
    reader = SyntheticLogReader(
        cam, num_frames=n_frames, cam_step=(0.004, 0.0, 0.0),
        cam_rot_step=(0.0, 0.002, 0.0),
    )
    frames = list(reader)  # pre-decode so IO is excluded, like the reference's Run timer

    engine = MultiMotionFusionTPU(cfg)
    for f in frames[:warmup]:
        engine.process_frame(f)
    engine.finish()
    t0 = time.time()
    for f in frames[warmup:]:
        engine.process_frame(f)
    engine.finish()
    dt = time.time() - t0
    fps = (n_frames - warmup) / dt

    print(
        json.dumps(
            {
                "metric": "e2e_fps_640x480_static",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
