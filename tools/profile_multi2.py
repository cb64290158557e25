"""Timings for the multi-model stages profile_multi.py does NOT cover:
full step, frame inputs, pyramids, SuperPoint x levels, tracker ops,
seeds/RANSAC, redetect/snapshot, fuse_flat, clean_flat, splat_resolve,
fill_in.

Usage: python tools/profile_multi2.py [--reps 5] [--skip-full]
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-full", action="store_true")
    args = ap.parse_args()

    from multimotionfusion_tpu import engine_multi as em
    from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
    from multimotionfusion_tpu.engine import (
        _detect_keypoints_level, _frame_inputs,
    )
    from multimotionfusion_tpu.model import fusion, surfel_map as sm
    from multimotionfusion_tpu.model.fillin import fill_in
    from multimotionfusion_tpu.odometry import levels as lv
    from multimotionfusion_tpu.ops import rasterize
    from multimotionfusion_tpu.parallel import dryrun
    from multimotionfusion_tpu.tracking import tracker
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
    Bg = bucket
    Bo = cfg.object_capacity
    obj = state.objects

    res = {}
    if not args.skip_full:
        full = lambda: em.multi_frame_step(
            state, rgb2, depth2, None, t, 1.0, eng.sp_params, cam, cfg,
            bucket, bucket_obj=Bo,
        )[0].pose
        t0 = time.perf_counter()
        jax.block_until_ready(full())
        print(f"full first-call (compile or cache hit): "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        res["FULL multi_frame_step"] = timeit(full, R)

    fi = jax.jit(lambda r, d: _frame_inputs(r, d, cam, cfg))
    rgb, depth_filt, vmap_raw, vmap_f, nmap_f = fi(rgb2, depth2)
    res["frame_inputs"] = timeit(lambda: fi(rgb2, depth2), R)

    odo_cfg = dataclasses.replace(cfg.odometry, mask_icp=False)
    pyr = jax.jit(lambda d, r, m: lv.build_frame_pyramids(d, r, m, odo_cfg))
    frame_pyr = pyr(depth_filt, rgb, state.prev_mask)
    res["build_frame_pyramids"] = timeit(
        lambda: pyr(depth_filt, rgb, state.prev_mask), R)

    det0 = jax.jit(lambda ip: _detect_keypoints_level(
        ip, cfg.odometry.init_lvl, cfg, eng.sp_params).xy)
    det0(frame_pyr.intensity)
    res[f"superpoint lvl{cfg.odometry.init_lvl}"] = timeit(
        lambda: det0(frame_pyr.intensity), R)
    if cfg.odometry.segm_lvl != cfg.odometry.init_lvl:
        det1 = jax.jit(lambda ip: _detect_keypoints_level(
            ip, cfg.odometry.segm_lvl, cfg, eng.sp_params).xy)
        det1(frame_pyr.intensity)
        res[f"superpoint lvl{cfg.odometry.segm_lvl}"] = timeit(
            lambda: det1(frame_pyr.intensity), R)

    kps = jax.jit(lambda ip: _detect_keypoints_level(
        ip, cfg.odometry.init_lvl, cfg, eng.sp_params))(frame_pyr.intensity)
    kcfg = cfg.keypoints
    tadd = jax.jit(lambda tr, k, d: tracker.prune(
        tracker.add_keypoints(tr, k, d, t, cam, kcfg), t, kcfg))
    tadd(state.tracks, kps, depth_filt)
    res["tracker add+prune"] = timeit(
        lambda: tadd(state.tracks, kps, depth_filt), R)

    if cfg.odom_init == "kp":
        seedg = jax.jit(lambda tr, rng: em._kp_seed(
            tr, t, tr.model_id == 0, state.pose, rng, cfg, True)[0])
        seedg(state.tracks, state.rng)
        res["kp_seed global (RANSAC)"] = timeit(
            lambda: seedg(state.tracks, state.rng), R)
        seeds = jax.jit(lambda o, tr, rng: em._seed_slots(o, tr, t, rng, cfg)[0])
        seeds(obj, state.tracks, state.rng)
        res[f"seed_slots x{n_slots} (RANSAC)"] = timeit(
            lambda: seeds(obj, state.tracks, state.rng), R)

    kp_p3d, kp_hasd = tracker.backproject_keypoints(kps, depth_filt, cam)
    in_seg = kps.valid & kp_hasd
    red = jax.jit(lambda o, k3, s, rng: em._redetect(o, kps, k3, s, rng, cfg)[:3])
    red(obj, kp_p3d, in_seg, state.rng)
    res["redetect (vmap slots)"] = timeit(
        lambda: red(obj, kp_p3d, in_seg, state.rng), R)

    snap = jax.jit(lambda o, tr: em._snapshot_tracks(o, tr, o.pose))
    snap(obj, state.tracks)
    res["snapshot_tracks"] = timeit(lambda: snap(obj, state.tracks), R)

    assoc = jax.jit(lambda tr, mk: em._associate_tracks(
        tr, mk, t, cam.height, cam.width))
    assoc(state.tracks, state.prev_mask)
    res["associate_tracks"] = timeit(
        lambda: assoc(state.tracks, state.prev_mask), R)

    # ---- composite fuse / clean / predict ----------------------------------
    sub = state.smap.bucketed(Bg)
    obj_db = obj.data[:, :, :Bo]
    seg_model = jnp.concatenate([
        jnp.zeros((Bg,), jnp.int32),
        jnp.arange(n_slots * Bo, dtype=jnp.int32) // Bo + 1,
    ])
    seg_bases = tuple([0, Bg] + [Bg + (k + 1) * Bo for k in range(n_slots)])
    conf_all = jnp.concatenate(
        [jnp.array([scfg.conf_threshold], jnp.float32), obj.conf_t])
    maxd_all = jnp.concatenate(
        [jnp.array([scfg.depth_cutoff], jnp.float32), obj.max_depth])
    active_all = jnp.concatenate([jnp.array([True]), obj.active])
    poses_all = jnp.concatenate([state.pose[None], obj.pose], axis=0)

    @jax.jit
    def build_flat():
        g_local = sm.transform_surfels(sub.data, se3.inverse_T(state.pose))
        o_local = jax.vmap(
            lambda d, p: sm.transform_surfels(d, se3.inverse_T(p))
        )(obj_db, obj.pose)
        flat = jnp.concatenate(
            [g_local, jnp.moveaxis(o_local, 0, 1).reshape(sm.CHANNELS, -1)],
            axis=1)
        galive = sub.alive_mask()
        oalive = jax.vmap(
            lambda d, c: (jnp.arange(Bo, dtype=jnp.int32) < c)
            & (d[sm.ALIVE] > 0))(obj_db, obj.count)
        return flat, jnp.concatenate([galive, oalive.reshape(-1)])

    flat_local, alive_flat = build_flat()

    pif = jax.jit(lambda fl, al: rasterize.predict_indices_flat(
        fl, al, seg_model, maxd_all, n_models, cam, t, scfg.time_delta))
    im = pif(flat_local, alive_flat)
    ga = jax.jit(rasterize.gather_attr_images)
    attrs = ga(im.data_local, im.index)
    wm = jax.jit(lambda ix: rasterize.win_model_image(ix, seg_bases, n_models))
    win_model = wm(im.index)
    res["win_model_image"] = timeit(lambda: wm(im.index), R)

    fs_w = jax.jit(lambda: sm.compute_frame_surfels(
        rgb, vmap_raw, vmap_f, nmap_f, cam, t, scfg.depth_cutoff, 1.0))()
    storage_flat = jnp.concatenate(
        [sub.data, jnp.moveaxis(obj_db, 0, 1).reshape(sm.CHANNELS, -1)], axis=1)
    counts_all = jnp.concatenate([sub.count[None], obj.count])
    mask = state.prev_mask

    ff = jax.jit(lambda sf, ca, f, i, a, w2: fusion.fuse_flat(
        sf, ca, seg_bases, f, i, mask, poses_all, maxd_all, active_all,
        cam, t, scfg, a, w2))
    fused_flat, counts_new = ff(storage_flat, counts_all, fs_w, im, attrs,
                                win_model)
    res["fuse_flat"] = timeit(
        lambda: ff(storage_flat, counts_all, fs_w, im, attrs, win_model), R)

    pos_in_seg = jnp.concatenate([
        jnp.arange(Bg, dtype=jnp.int32),
        jnp.tile(jnp.arange(Bo, dtype=jnp.int32), n_slots)])
    count_per_surfel = rasterize.take_small(counts_new, seg_model, n_models)
    alive_pf = (pos_in_seg < count_per_surfel) & (fused_flat[sm.ALIVE] > 0)

    cf = jax.jit(lambda f, cn, ap, i, d, a, w2: fusion.clean_flat(
        f, cn, seg_model, ap, i, d, conf_all, cam, t, scfg.time_delta,
        scfg, a, w2))
    cf(fused_flat, counts_new, alive_pf, im, depth_filt, attrs, win_model)
    res["clean_flat"] = timeit(
        lambda: cf(fused_flat, counts_new, alive_pf, im, depth_filt, attrs,
                   win_model), R)

    conf_px = rasterize.take_small(conf_all, win_model, n_models)
    sr = jax.jit(lambda i, a, cp, w2: rasterize.splat_resolve(
        i, cam, 0.0, t, t, scfg.time_delta, scfg.splat_footprint,
        attrs=a, conf_img=cp, own_img=w2))
    pred = sr(im, attrs, conf_px, win_model)
    res["splat_resolve"] = timeit(
        lambda: sr(im, attrs, conf_px, win_model), R)

    conf_img = sm.pixel_confidence(cam, 1.0)
    rad_img = sm.radius_from_depth(vmap_f[..., 2], nmap_f[..., 2], cam)
    fin = jax.jit(lambda p: fill_in(
        p, rgb, vmap_f, nmap_f, conf_img, rad_img, cfg.frame_to_frame_rgb,
        gate=mask == 0))
    fin(pred)
    res["fill_in"] = timeit(lambda: fin(pred), R)

    print(f"\nslots={n_slots} Bg={Bg} Bo={Bo}")
    for k, v in sorted(res.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
