"""Per-stage device timings of the production frame step on the real chip.

Builds a realistic 640x480 static-mode state (N warm frames so the surfel
map/bucket reach production size), then times each stage of _frame_core with
async-dispatch batching (issue K calls, block once; the tunnel's per-dispatch
latency amortises across the queue).

Usage: python tools/profile_frame.py [--frames 40] [--reps 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, reps: int) -> float:
    """Median-of-3 of (issue `reps` async calls, block once) in ms/call."""
    out = fn()
    jax.block_until_ready(out)
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        best.append((time.perf_counter() - t0) / reps * 1e3)
    return sorted(best)[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    from multimotionfusion_tpu import engine as eng_mod
    from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
    from multimotionfusion_tpu.engine import MultiMotionFusionTPU
    from multimotionfusion_tpu.io.readers import SyntheticLogReader
    from multimotionfusion_tpu.model import fusion, surfel_map as sm
    from multimotionfusion_tpu.model.fillin import fill_in
    from multimotionfusion_tpu.odometry import levels as lv, rgbd
    from multimotionfusion_tpu.ops import image as imops, maps as mapops, rasterize

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
    scfg = cfg.surfels
    time_ = engine.tick

    R = args.reps
    res = {}

    # full frame step
    res["FULL _frame_step"] = timeit(
        lambda: eng_mod._frame_step(
            state, rgb_u8, depth_raw, mask, time_, 1.0, engine.sp_params,
            cam, cfg, bucket, bucket, uv,
        )[0].pose,
        R,
    )

    # stage: frame inputs
    fi = jax.jit(
        lambda r, d, u: eng_mod._frame_inputs(r, d, cam, cfg, u)
    )
    rgb, depth_filt, vmap_raw, vmap_f, nmap_f = fi(rgb_u8, depth_raw, uv)
    res["frame_inputs (yuv+bilateral+vmaps)"] = timeit(
        lambda: fi(rgb_u8, depth_raw, uv), R
    )

    pyr = jax.jit(
        lambda d, r, m: lv.build_frame_pyramids(d, r, m, cfg.odometry)
    )
    frame_pyr = pyr(depth_filt, rgb, mask)
    res["build_frame_pyramids"] = timeit(lambda: pyr(depth_filt, rgb, mask), R)

    ld = jax.jit(
        lambda fp, vc, nr, c: lv.build_level_data(
            fp, vc[..., :3], nr[..., :3], c, cam, cfg.odometry, 0
        )
    )
    pred_int = jax.jit(imops.rgb_to_intensity)(state.filled.color)
    levels = ld(frame_pyr, state.filled.vertex_conf, state.filled.normal_rad, pred_int)
    res["build_level_data"] = timeit(
        lambda: ld(frame_pyr, state.filled.vertex_conf, state.filled.normal_rad, pred_int),
        R,
    )

    res["odometry GN solve"] = timeit(
        lambda: rgbd.get_incremental_transformation(
            state.pose, levels, state.last_intensity_coarse, cfg.odometry, cam, 0
        ).pose,
        R,
    )

    cfs = jax.jit(
        lambda r, vr, vf, nf: sm.compute_frame_surfels(
            r, vr, vf, nf, cam, time_, scfg.depth_cutoff, 1.0
        )
    )
    fs = cfs(rgb, vmap_raw, vmap_f, nmap_f)
    res["compute_frame_surfels"] = timeit(lambda: cfs(rgb, vmap_raw, vmap_f, nmap_f), R)

    sub = state.smap.bucketed(bucket)
    pi = jax.jit(
        lambda s, p: rasterize.predict_indices(
            s, p, cam, time_, scfg.time_delta, scfg.depth_cutoff
        )
    )
    im = pi(sub, state.pose)
    res["predict_indices (zmin scatter)"] = timeit(lambda: pi(sub, state.pose).index, R)

    ga = jax.jit(rasterize.gather_attr_images)
    attrs = ga(im.data_local, im.index)
    res["gather_attr_images"] = timeit(lambda: ga(im.data_local, im.index), R)

    fu = jax.jit(
        lambda s, f, i, m, p, a: fusion.fuse(
            s, f, i, m, 0, p, cam, time_, scfg, attrs=a
        )
    )
    fused = fu(sub, fs, im, mask, state.pose, attrs)
    res["fusion.fuse"] = timeit(
        lambda: fu(sub, fs, im, mask, state.pose, attrs).data, R
    )

    cl = jax.jit(
        lambda s, i, d, m, p, a: fusion.clean(
            s, i, d, m, 0, p, cam, time_, scfg.time_delta,
            scfg.conf_threshold, scfg, attrs=a,
        )
    )
    res["fusion.clean"] = timeit(
        lambda: cl(fused, im, depth_filt, mask, state.pose, attrs).data, R
    )

    sr = jax.jit(
        lambda i, a: rasterize.splat_resolve(
            i, cam, scfg.conf_threshold, time_, time_, scfg.time_delta,
            scfg.splat_footprint, attrs=a,
        )
    )
    pred = sr(im, attrs)
    res["splat_resolve"] = timeit(lambda: sr(im, attrs).color, R)

    conf_img = jax.jit(lambda: sm.pixel_confidence(cam, 1.0))()
    rad_img = jax.jit(
        lambda v, n: sm.radius_from_depth(v[..., 2], n[..., 2], cam)
    )(vmap_f, nmap_f)
    fin = jax.jit(
        lambda p, r, v, n, c, rd: fill_in(p, r, v, n, c, rd, cfg.frame_to_frame_rgb)
    )
    res["fill_in"] = timeit(
        lambda: fin(pred, rgb, vmap_f, nmap_f, conf_img, rad_img).color, R
    )

    total_stages = sum(v for k, v in res.items() if not k.startswith("FULL"))
    print()
    for k, v in sorted(res.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.2f} ms  {k}")
    print(f"{total_stages:8.2f} ms  == sum of stages")


if __name__ == "__main__":
    main()
