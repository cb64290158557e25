"""Capture a device trace of the batched multi-model step and print the
per-op device-time breakdown (the only trustworthy profile on the axon
tunnel backend — see tools/truetime.py).

Usage: python tools/trace_multi.py [--mode multi|static] [--batch 5]
                                   [--out /tmp/mmf_trace]
"""

from __future__ import annotations

import argparse
import functools
import glob
import gzip
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def analyse(outdir: str, top: int = 45, frames: int = 5):
    import re

    files = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                             recursive=True))
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    evs = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = [p for p, n in pids.items() if n and "TPU" in n]
    dev = [e for e in evs if e.get("pid") in dev_pids and e.get("ph") == "X"]
    c = Counter()
    n = Counter()
    for e in dev:
        name = e["name"]
        a = e.get("args") or {}
        longname = a.get("long_name") or a.get("hlo_op") or name
        c[longname] += e["dur"]
        n[longname] += 1
    total = sum(c.values())
    print(f"\n{len(dev)} device events, total {total/1000:.2f} ms")
    for k, v in c.most_common(top):
        print(f"{v/1000:9.3f} ms  x{n[k]:<4d} {k[:160]}")

    # LEAF accounting (containers excluded so nothing double-counts): by
    # output shape, plus the dispatch tail of tiny ops — the numbers the
    # round-5 optimisation pass was driven by
    cont = re.compile(r"^(%?(while|conditional|call)|jit)")
    leaf = [e for e in dev if not cont.match(e["name"])]
    lt = sum(e["dur"] for e in leaf)
    print(f"\nLEAF: {len(leaf)} events, {lt/1000:.2f} ms total "
          f"({lt/(1000*frames):.2f} ms/frame over {frames} frames)")
    cs = Counter()
    ns = Counter()
    for e in leaf:
        a = e.get("args") or {}
        ln = a.get("long_name") or ""
        m = re.search(r"= (\S+?)\s", ln)
        shape = m.group(1) if m else e["name"].split(".")[0]
        cs[shape] += e["dur"]
        ns[shape] += 1
    for k, v in cs.most_common(30):
        print(f"{v/(1000*frames):7.3f} ms/f x{ns[k]:<6d} {k[:90]}")
    tiny = [e for e in leaf if e["dur"] < 20]
    print(f"tiny (<20us) tail: {len(tiny)} ops, "
          f"{sum(e['dur'] for e in tiny)/(1000*frames):.2f} ms/frame")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="multi")
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--out", default="/tmp/mmf_trace")
    ap.add_argument("--analyse-only", default="")
    args = ap.parse_args()
    if args.analyse_only:
        analyse(args.analyse_only)
        return

    import numpy as np

    from multimotionfusion_tpu.config import (
        CameraModel, EngineConfig, SurfelConfig,
    )
    from multimotionfusion_tpu.parallel import dryrun

    cam = CameraModel()
    if args.mode == "multi":
        from multimotionfusion_tpu import engine_multi as em

        cfg = EngineConfig(
            camera=cam, enable_multi_model=True, object_slots=5,
            object_capacity=1 << 16,
            surfels=SurfelConfig(max_surfels=1 << 19),
            upload_depth_mm=False, upload_yuv420=False,
        )
        eng, state, rgb2, depth2 = dryrun.build_state(cfg)
        B = args.batch
        rgbs = jnp.broadcast_to(jnp.asarray(rgb2)[None], (B,) + rgb2.shape)
        depths = jnp.broadcast_to(jnp.asarray(depth2)[None], (B,) + depth2.shape)
        stepb = functools.partial(
            em.multi_frame_steps_batch, sp_params=eng.sp_params, cam=cam,
            cfg=cfg, bucket_fuse=cfg.surfels.max_surfels,
            bucket_obj=cfg.object_capacity,
        )
        jb = jax.jit(lambda st, r, d: stepb(st, r, d, None, 2, 1.0)[0])
        state = jb(state, rgbs, depths)  # warm outside the trace
        np.asarray(state.pose.ravel()[0:1])
        with jax.profiler.trace(args.out):
            state = jb(state, rgbs, depths)
            np.asarray(state.pose.ravel()[0:1])
    else:
        from multimotionfusion_tpu import engine as eng_mod
        from multimotionfusion_tpu.engine import MultiMotionFusionTPU
        from multimotionfusion_tpu.io.readers import SyntheticLogReader

        cfg = EngineConfig(
            camera=cam, enable_multi_model=False, odom_init="",
            surfels=SurfelConfig(max_surfels=1 << 20),
            upload_depth_mm=False, upload_yuv420=False,
        )
        reader = SyntheticLogReader(cam, num_frames=20,
                                    cam_step=(0.004, 0.0, 0.0),
                                    cam_rot_step=(0.0, 0.002, 0.0))
        frames = list(reader)
        engine = MultiMotionFusionTPU(cfg)
        for f in frames[:8]:
            engine.process_frame(f)
        engine.finish()
        bucket_fuse, bucket_pred = engine._buckets()
        B = args.batch
        rgb2 = jnp.asarray(frames[8].rgb.astype("float32"))
        depth2 = jnp.asarray(frames[8].depth)
        rgbs = jnp.broadcast_to(rgb2[None], (B,) + rgb2.shape)
        depths = jnp.broadcast_to(depth2[None], (B,) + depth2.shape)
        stepb = functools.partial(
            eng_mod._frame_steps_batch, sp_params=engine.sp_params, cam=cam,
            cfg=engine.cfg, bucket_fuse=bucket_fuse, bucket_pred=bucket_pred,
        )
        jb = jax.jit(lambda st, r, d: stepb(st, r, d, 9, 1.0)[0])
        state = jb(engine.state, rgbs, depths)
        np.asarray(state.pose.ravel()[0:1])
        with jax.profiler.trace(args.out):
            state = jb(state, rgbs, depths)
            np.asarray(state.pose.ravel()[0:1])
    analyse(args.out)


if __name__ == "__main__":
    main()
