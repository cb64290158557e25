"""Dump the optimized HLO of the production _frame_step and print the
definition headers of named fusions (to pair with tools/trace_step.py).

Usage: python tools/dump_hlo.py fusion.39 fusion.37 fusion.40
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    names = sys.argv[1:] or ["fusion.39", "fusion.37", "fusion.40"]
    from multimotionfusion_tpu import engine as eng_mod
    from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
    from multimotionfusion_tpu.engine import MultiMotionFusionTPU
    from multimotionfusion_tpu.io.readers import SyntheticLogReader

    cam = CameraModel()
    cfg = EngineConfig(
        camera=cam, enable_multi_model=False, odom_init="",
        surfels=SurfelConfig(max_surfels=1 << 20),
    )
    reader = SyntheticLogReader(cam, num_frames=2)
    frames = list(reader)
    engine = MultiMotionFusionTPU(cfg)
    engine.process_frame(frames[0])
    state = engine.state
    bucket = 393216

    arrs = engine.upload(frames[1], background=False)[1]
    if arrs[0].ndim == 2:
        rgb_u8, depth_raw, uv = arrs[:3]
    else:
        (rgb_u8, depth_raw), uv = arrs, None
    mask = jnp.zeros((cam.height, cam.width), jnp.int32)

    lowered = eng_mod._frame_step.lower(
        state, rgb_u8, depth_raw, mask, 2, 1.0, engine.sp_params,
        cam, cfg, bucket, bucket, uv,
    )
    txt = lowered.compile().as_text()
    path = "/tmp/frame_step_hlo.txt"
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB to {path}")

    lines = txt.splitlines()
    for want in names:
        pat = re.compile(r"^\s*%?" + re.escape(want) + r"\s*=")
        for i, ln in enumerate(lines):
            if pat.match(ln):
                print("=" * 100)
                print(ln[:2000])
                break


if __name__ == "__main__":
    main()
