"""True per-frame device time of the static and multi-model batched steps.

Slope method (tools/truetime.py): chain K batched-scan steps with the state
threaded through, one 4-byte readback at the end. Separates DEVICE cost from
the tunnel/host overhead that wall-clock benches see.

Usage: python tools/true_frame.py [--mode multi|static|both] [--batch 5]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from truetime import time_chain  # noqa: E402


def multi(batch: int):
    import functools

    from multimotionfusion_tpu import engine_multi as em
    from multimotionfusion_tpu.config import (
        CameraModel, EngineConfig, SurfelConfig,
    )
    from multimotionfusion_tpu.parallel import dryrun

    cam = CameraModel()
    cfg = EngineConfig(
        camera=cam,
        enable_multi_model=True,
        object_slots=5,
        object_capacity=1 << 16,
        surfels=SurfelConfig(max_surfels=1 << 19),
        upload_depth_mm=False,
        upload_yuv420=False,
    )
    eng, state, rgb2, depth2 = dryrun.build_state(cfg)
    Bg = cfg.surfels.max_surfels
    Bo = cfg.object_capacity
    rgbs = jnp.broadcast_to(jnp.asarray(rgb2)[None], (batch,) + rgb2.shape)
    depths = jnp.broadcast_to(jnp.asarray(depth2)[None], (batch,) + depth2.shape)

    stepb = functools.partial(
        em.multi_frame_steps_batch,
        sp_params=eng.sp_params, cam=cam, cfg=cfg,
        bucket_fuse=Bg, bucket_obj=Bo,
    )
    jb = jax.jit(
        lambda st, r, d: stepb(st, r, d, None, 2, 1.0)[0],
    )

    def step(st):
        return jb(st, rgbs, depths)

    ms = time_chain(step, state, k_lo=2, k_hi=12, outer=5)
    print(f"multi  batch={batch}: {ms:8.2f} ms/batch = "
          f"{ms / batch:6.2f} ms/frame ({1000 / (ms / batch):5.1f} fps device)")


def static(batch: int):
    import functools

    from multimotionfusion_tpu import engine as eng_mod
    from multimotionfusion_tpu.config import (
        CameraModel, EngineConfig, SurfelConfig,
    )
    from multimotionfusion_tpu.engine import MultiMotionFusionTPU
    from multimotionfusion_tpu.io.readers import SyntheticLogReader

    cam = CameraModel()
    cfg = EngineConfig(
        camera=cam,
        enable_multi_model=False,
        odom_init="",
        surfels=SurfelConfig(max_surfels=1 << 20),
        upload_depth_mm=False,
        upload_yuv420=False,
    )
    reader = SyntheticLogReader(cam, num_frames=20,
                                cam_step=(0.004, 0.0, 0.0),
                                cam_rot_step=(0.0, 0.002, 0.0))
    frames = list(reader)
    engine = MultiMotionFusionTPU(cfg)
    for f in frames[:8]:
        engine.process_frame(f)
    engine.finish()
    state = engine.state
    bucket = engine._buckets()[0] if hasattr(engine, "_buckets") else cfg.surfels.max_surfels
    try:
        bucket_fuse, bucket_pred = engine._buckets()
    except Exception:
        bucket_fuse = bucket_pred = cfg.surfels.max_surfels
    print(f"static buckets: fuse={bucket_fuse} pred={bucket_pred}")

    rgb2 = jnp.asarray(frames[8].rgb.astype("float32"))
    depth2 = jnp.asarray(frames[8].depth)
    rgbs = jnp.broadcast_to(rgb2[None], (batch,) + rgb2.shape)
    depths = jnp.broadcast_to(depth2[None], (batch,) + depth2.shape)

    stepb = functools.partial(
        eng_mod._frame_steps_batch,
        sp_params=engine.sp_params, cam=cam, cfg=engine.cfg,
        bucket_fuse=bucket_fuse, bucket_pred=bucket_pred,
    )
    jb = jax.jit(lambda st, r, d: stepb(st, r, d, 9, 1.0)[0])

    def step(st):
        return jb(st, rgbs, depths)

    ms = time_chain(step, state, k_lo=2, k_hi=12, outer=5)
    print(f"static batch={batch}: {ms:8.2f} ms/batch = "
          f"{ms / batch:6.2f} ms/frame ({1000 / (ms / batch):5.1f} fps device)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both")
    ap.add_argument("--batch", type=int, default=5)
    args = ap.parse_args()
    if args.mode in ("static", "both"):
        static(args.batch)
    if args.mode in ("multi", "both"):
        multi(args.batch)
