"""Per-stage device timings of the COMPOSITE multi-model frame step.

Builds the bench's 5-object 640x480 state (parallel.dryrun.build_state), then
times the FULL multi_frame_step plus each composite stage in isolation.

Usage: python tools/profile_multi.py [--slots 5] [--reps 10] [--trace /tmp/x]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def timeit(fn, reps: int) -> float:
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
    ap.add_argument("--slots", type=int, default=5)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--trace", default="")
    ap.add_argument("--bucket-obj", type=int, default=0,
                    help="object work bucket (0 = object_capacity)")
    ap.add_argument("--no-full", action="store_true",
                    help="skip the FULL-step timing (slow first compile)")
    args = ap.parse_args()

    from multimotionfusion_tpu import engine_multi as em
    from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
    from multimotionfusion_tpu.model import surfel_map as sm
    from multimotionfusion_tpu.odometry import levels as lv, multi as modo_mod
    from multimotionfusion_tpu.ops import image as imops, rasterize
    from multimotionfusion_tpu.parallel import dryrun
    from multimotionfusion_tpu.segmentation import flow_crf as seg
    from multimotionfusion_tpu.utils import se3

    cam = CameraModel()
    cfg = EngineConfig(
        camera=cam,
        enable_multi_model=True,
        object_slots=args.slots,
        object_capacity=1 << 16,
        surfels=SurfelConfig(max_surfels=1 << 19),
        upload_depth_mm=False,
        upload_yuv420=False,
    )
    eng, state, rgb2, depth2 = dryrun.build_state(cfg)
    bucket = cfg.surfels.max_surfels
    rgb2 = jnp.asarray(rgb2)
    depth2 = jnp.asarray(depth2)
    t = 2
    R = args.reps
    scfg = cfg.surfels
    n_slots = args.slots
    n_models = 1 + n_slots
    Bo = args.bucket_obj or cfg.object_capacity

    def full():
        return em.multi_frame_step(
            state, rgb2, depth2, None, t, 1.0, eng.sp_params, cam, cfg, bucket,
            bucket_obj=Bo,
        )[0].pose

    res = {}
    if not args.no_full:
        res["FULL multi_frame_step"] = timeit(full, R)

    if args.trace:
        jax.block_until_ready(full())
        with jax.profiler.trace(args.trace):
            out = None
            for _ in range(R):
                out = full()
            jax.block_until_ready(out)
        print("trace written to", args.trace)

    # ---- stages -------------------------------------------------------------
    from multimotionfusion_tpu.engine import _frame_inputs

    fi = jax.jit(lambda r, d: _frame_inputs(r, d, cam, cfg))
    rgb, depth_filt, vmap_raw, vmap_f, nmap_f = fi(rgb2, depth2)
    mask_prev = state.prev_mask
    odo_cfg = dataclasses.replace(cfg.odometry, mask_icp=False)
    pyr = jax.jit(lambda d, r, m: lv.build_frame_pyramids(d, r, m, odo_cfg))
    frame_pyr = pyr(depth_filt, rgb, mask_prev)
    obj = state.objects

    ld = jax.jit(
        lambda fp, vc, nr, c: lv.build_level_data(
            fp, vc[..., :3], nr[..., :3], c, cam, odo_cfg, 0
        )
    )
    pred_int = jax.jit(imops.rgb_to_intensity)(state.filled.color)
    levels = ld(frame_pyr, state.filled.vertex_conf, state.filled.normal_rad,
                pred_int)
    res["build_level_data (composite)"] = timeit(
        lambda: ld(frame_pyr, state.filled.vertex_conf,
                   state.filled.normal_rad, pred_int), R,
    )

    T_prev_all = jnp.concatenate([state.pose[None], obj.pose], axis=0)
    active_all = jnp.concatenate([jnp.array([True]), obj.active])
    res[f"composite GN x{n_models} models"] = timeit(
        lambda: modo_mod.multi_incremental_transformation(
            T_prev_all, levels, state.last_intensity_coarse, odo_cfg, cam,
            n_models, active=active_all,
        ).poses, R,
    )

    # flat arrays
    sub = state.smap.bucketed(bucket)

    @jax.jit
    def build_flat():
        g_local = sm.transform_surfels(sub.data, se3.inverse_T(state.pose))
        o_local = jax.vmap(
            lambda d, p: sm.transform_surfels(d, se3.inverse_T(p))
        )(obj.data[:, :, :Bo], obj.pose)
        flat = jnp.concatenate(
            [g_local, jnp.moveaxis(o_local, 0, 1).reshape(sm.CHANNELS, -1)],
            axis=1,
        )
        galive = sub.alive_mask()
        oalive = jax.vmap(
            lambda d, c: (jnp.arange(Bo, dtype=jnp.int32) < c)
            & (d[sm.ALIVE] > 0)
        )(obj.data[:, :, :Bo], obj.count)
        return flat, jnp.concatenate([galive, oalive.reshape(-1)])

    flat_local, alive_flat = build_flat()
    res["flat transform+alive"] = timeit(lambda: build_flat(), R)

    seg_model = jnp.concatenate(
        [jnp.zeros((bucket,), jnp.int32),
         jnp.arange(n_slots * Bo, dtype=jnp.int32) // Bo + 1]
    )
    conf_all = jnp.concatenate(
        [jnp.array([scfg.conf_threshold]), obj.conf_t]
    )
    maxd_all = jnp.concatenate(
        [jnp.array([scfg.depth_cutoff]), obj.max_depth]
    )
    cam_c = em._crf_camera(cam, cfg.segmentation.scale)
    rmd = jax.jit(
        lambda fl, al: rasterize.render_model_depths(
            fl, al, seg_model, conf_all, maxd_all, n_models, cam_c, t,
            scfg.time_delta,
        )
    )
    pred_depth_c = rmd(flat_local, alive_flat)
    res["render_model_depths (1/4 res)"] = timeit(
        lambda: rmd(flat_local, alive_flat), R
    )

    pif = jax.jit(
        lambda fl, al: rasterize.predict_indices_flat(
            fl, al, seg_model, maxd_all, n_models, cam, t,
            scfg.time_delta,
        )
    )
    im = pif(flat_local, alive_flat)
    res["predict_indices_flat"] = timeit(
        lambda: pif(flat_local, alive_flat).index, R
    )

    ga = jax.jit(rasterize.gather_attr_images)
    attrs = ga(im.data_local, im.index)
    res["gather_attr_images (flat)"] = timeit(
        lambda: ga(im.data_local, im.index), R
    )

    # flow-CRF at CRF-scale depth
    intensity = frame_pyr.intensity[0]
    model_active = jnp.concatenate([jnp.array([True]), obj.active])
    txy = state.tracks.xy[:, 0]
    vel = jnp.zeros((n_models, state.tracks.xy.shape[0]), jnp.float32)
    pv = jnp.zeros((state.tracks.xy.shape[0],), bool)
    seg_j = jax.jit(
        lambda pi, ni, df, pd: seg.flow_crf_segmentation(
            pi, ni, df, pd, model_active, txy, vel, pv, cam,
            cfg.segmentation, pred_at_crf_scale=True,
        ).mask
    )
    res["flow_crf_segmentation"] = timeit(
        lambda: seg_j(state.prev_intensity, intensity, depth_filt,
                      pred_depth_c), R
    )

    print(f"\nslots={n_slots} bucket={bucket} Bo={Bo}")
    for k, v in sorted(res.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
