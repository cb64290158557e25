"""Capture a jax.profiler trace of the production _frame_step and print the
top device ops by total time (parsed from the perfetto trace.json.gz).

Usage: python tools/trace_step.py [--frames 40] [--reps 10]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default="/tmp/jaxtrace")
    args = ap.parse_args()

    from multimotionfusion_tpu import engine as eng_mod
    from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
    from multimotionfusion_tpu.engine import MultiMotionFusionTPU
    from multimotionfusion_tpu.io.readers import SyntheticLogReader

    cam = CameraModel()
    cfg = EngineConfig(
        camera=cam, enable_multi_model=False, odom_init="",
        surfels=SurfelConfig(max_surfels=1 << 20),
    )
    reader = SyntheticLogReader(
        cam, num_frames=args.frames + 1, cam_step=(0.004, 0.0, 0.0),
        cam_rot_step=(0.0, 0.002, 0.0),
    )
    frames = list(reader)
    engine = MultiMotionFusionTPU(cfg)
    for f in frames[:-1]:
        engine.process_frame(f)
    engine.finish()
    state = engine.state
    bucket, _ = engine._buckets()
    print(f"hwm={int(state.smap.count)} bucket={bucket}")

    f_last = frames[-1]
    arrs = engine.upload(f_last, background=False)[1]
    if arrs[0].ndim == 2:
        rgb_u8, depth_raw, uv = arrs[:3]
    else:
        (rgb_u8, depth_raw), uv = arrs, None
    mask = jnp.zeros((cam.height, cam.width), jnp.int32)
    t = engine.tick

    def step():
        return eng_mod._frame_step(
            state, rgb_u8, depth_raw, mask, t, 1.0, engine.sp_params,
            cam, cfg, bucket, bucket, uv,
        )[0].pose

    jax.block_until_ready(step())
    with jax.profiler.trace(args.out):
        out = None
        for _ in range(args.reps):
            out = step()
        jax.block_until_ready(out)

    paths = sorted(
        glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no trace.json.gz found under", args.out)
        return
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    # device-thread slices: aggregate wall duration by op name
    events = tr.get("traceEvents", [])
    # find pids whose process name mentions TPU/device
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dur_by_name = collections.Counter()
    cnt_by_name = collections.Counter()
    total = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        name = e.get("name", "?")
        d = e.get("dur", 0)
        dur_by_name[name] += d
        cnt_by_name[name] += 1
        total += d
    print(f"total device time: {total / 1e3 / args.reps:.2f} ms/step over "
          f"{args.reps} steps; top ops:")
    for name, d in dur_by_name.most_common(35):
        print(f"{d / 1e3 / args.reps:9.3f} ms  x{cnt_by_name[name] // args.reps:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
