"""Dissect fusion.fuse / clean / splat_resolve stage by stage on the chip.

Synthetic production-shaped inputs (bucket 393216, 640x480).
Usage: python tools/profile_fuse.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
from multimotionfusion_tpu.model import fusion, surfel_map as sm
from multimotionfusion_tpu.ops import rasterize


def timeit(fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best.append((time.perf_counter() - t0) / reps * 1e3)
    return sorted(best)[1]


def main():
    cam = CameraModel()
    scfg = SurfelConfig()
    h, w = cam.height, cam.width
    N = 393216
    time_ = jnp.int32(40)
    key = jax.random.PRNGKey(0)

    # plausible live map: points in front of the camera
    k1, k2, k3 = jax.random.split(key, 3)
    pts = jax.random.uniform(k1, (3, N), jnp.float32, -1.0, 1.0)
    pts = pts.at[2].set(jnp.abs(pts[2]) * 2 + 0.5)
    data = jnp.zeros((sm.CHANNELS, N), jnp.float32)
    data = data.at[sm.POS].set(pts)
    nrm = jax.random.normal(k2, (3, N), jnp.float32)
    nrm = nrm / jnp.linalg.norm(nrm, axis=0, keepdims=True)
    data = data.at[sm.NORMAL].set(nrm)
    data = data.at[sm.CONF].set(1.0)
    data = data.at[sm.RADIUS].set(0.01)
    data = data.at[sm.LAST_T].set(39.0)
    data = data.at[sm.INIT_T].set(1.0)
    data = data.at[sm.ALIVE].set(1.0)
    smap = sm.SurfelMap(data=data, count=jnp.int32(N - 1024))
    pose = jnp.eye(4, dtype=jnp.float32)

    pi = jax.jit(lambda s, p: rasterize.predict_indices(
        s, p, cam, time_, scfg.time_delta, scfg.depth_cutoff))
    im = jax.block_until_ready(pi(smap, pose))
    ga = jax.jit(rasterize.gather_attr_images)
    attrs = jax.block_until_ready(ga(im.data_local, im.index))

    # frame surfels: reuse map points projected = dense-ish depth
    depth = jnp.where(
        im.index >= 0, attrs[sm.PZ], 0.0
    ) + jax.random.uniform(k3, (h, w), jnp.float32, 0.0, 0.002)
    rgb = jax.random.uniform(key, (h, w, 3), jnp.float32, 0, 255)
    from multimotionfusion_tpu.ops import maps as mapops
    vmap_raw = jax.jit(lambda d: mapops.create_vmap(d, cam, scfg.depth_cutoff))(depth)
    nmap = jax.jit(mapops.create_nmap)(vmap_raw)
    fs = jax.block_until_ready(jax.jit(
        lambda r, v, n: sm.compute_frame_surfels(
            r, v, v, n, cam, time_, scfg.depth_cutoff, 1.0)
    )(rgb, vmap_raw, nmap))
    mask = jnp.zeros((h, w), jnp.int32)

    r = {}
    r["predict_indices"] = timeit(lambda: pi(smap, pose).index)
    r["gather_attr_images"] = timeit(lambda: ga(im.data_local, im.index))

    full = jax.jit(lambda s, f, i, m, p, a: fusion.fuse(
        s, f, i, m, 0, p, cam, time_, scfg, attrs=a))
    r["fuse FULL"] = timeit(lambda: full(smap, fs, im, mask, pose, attrs).data)

    # stage A: window search only
    def win_only(f, i, m, a):
        hh, ww = cam.height, cam.width
        ys = jnp.arange(hh, dtype=jnp.float32)[:, None]
        xs = jnp.arange(ww, dtype=jnp.float32)[None, :]
        xl = (xs - cam.cx) / cam.fx
        yl = (ys - cam.cy) / cam.fy
        lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
        fz = f.data[sm.PZ].reshape(hh, ww)
        fnx = f.data[sm.NX].reshape(hh, ww)
        fny = f.data[sm.NY].reshape(hh, ww)
        fnz = f.data[sm.NZ].reshape(hh, ww)
        best_dist = jnp.full((hh, ww), jnp.float32(1000.0))
        best_tgt = jnp.full((hh, ww), rasterize.INVALID)
        for dy, dx in fusion._window_offsets(scfg.assoc_window):
            cand = fusion._shift_with_invalid(i.index, dy, dx, rasterize.INVALID)
            cvalid = cand >= 0
            cdat = jnp.roll(a, (-dy, -dx), axis=(1, 2))
            cpx, cpy, cpz = cdat[sm.PX], cdat[sm.PY], cdat[sm.PZ]
            zdiff = cpz - fz
            z_ok = jnp.abs(zdiff * lam) < scfg.assoc_depth_gate
            rx = yl * cpz - cpy
            ry = cpx - xl * cpz
            rz = xl * cpy - yl * cpx
            dist = jnp.sqrt(rx * rx + ry * ry + rz * rz)
            cnx, cny, cnz = cdat[sm.NX], cdat[sm.NY], cdat[sm.NZ]
            cosang = jnp.clip(cnx * fnx + cny * fny + cnz * fnz, -1.0, 1.0)
            n_ok = (jnp.abs(cnz) < 0.75) | (jnp.abs(jnp.arccos(cosang)) < 0.5)
            better = cvalid & z_ok & n_ok & (dist < best_dist)
            best_dist = jnp.where(better, dist, best_dist)
            best_tgt = jnp.where(better, cand, best_tgt)
        return best_tgt

    wj = jax.jit(win_only)
    r["fuse: window search"] = timeit(lambda: wj(fs, im, mask, attrs))

    best_tgt = jax.block_until_ready(wj(fs, im, mask, attrs))

    # stage B: checkerboard extraction matmul
    def cb_extract(bt, f):
        hh, ww = cam.height, cam.width
        ti = jnp.int32(time_)
        par = ti % 2
        hc, wc = hh // 2, ww // 2
        stack = jnp.concatenate([
            (bt >= 0).astype(jnp.float32)[None],
            bt.astype(jnp.float32)[None],
            jnp.ones((1, hh, ww), jnp.float32),
            f.data.reshape(sm.CHANNELS, hh, ww),
        ], axis=0)
        rows = jax.lax.dynamic_slice(
            stack, (jnp.int32(0), par, jnp.int32(0)),
            (stack.shape[0], hh - 1, ww))[:, ::2, :]
        sel = (jax.lax.broadcasted_iota(jnp.int32, (ww, wc), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (ww, wc), 1) * 2 + par
               ).astype(jnp.float32)
        sel = jax.lax.optimization_barrier(sel)
        cb = jax.lax.dot_general(
            rows.reshape(-1, ww), sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(stack.shape[0], hc, wc)
        return cb

    cbj = jax.jit(cb_extract)
    r["fuse: cb extract matmul"] = timeit(lambda: cbj(best_tgt, fs))
    cb_all = jax.block_until_ready(cbj(best_tgt, fs))

    # stage C: winner arbitration scatter-min
    n_cb = (h // 2) * (w // 2)

    def winners(cb):
        merging = (cb[0] > 0.5).reshape(n_cb)
        target = cb[1].astype(jnp.int32).reshape(n_cb)
        pix_ids = jnp.arange(n_cb, dtype=jnp.int32)
        tgt_safe = jnp.where(merging, target, N)
        winner_of = jnp.full((N + 1,), jnp.int32(2**31 - 1)).at[tgt_safe].min(pix_ids)
        return merging & (winner_of[tgt_safe] == pix_ids)

    wj2 = jax.jit(winners)
    r["fuse: winner scatter-min"] = timeit(lambda: wj2(cb_all))

    # stage D: merge math (transform + gather + weighted avg)
    def merge_math(cb, i):
        target_img = cb[1].astype(jnp.int32)
        new_global = sm.transform_surfels(cb[3:].reshape(sm.CHANNELS, n_cb), pose)
        old_local = rasterize.gather_attr_images(
            i.data_local, target_img).reshape(sm.CHANNELS, n_cb)
        old = sm.transform_surfels(old_local, pose)
        c_k = old[sm.CONF]
        a2 = new_global[sm.CONF]
        csum = jnp.maximum(c_k + a2, 1e-12)
        return old[sm.PX] * c_k / csum + new_global[sm.PX] * a2 / csum

    mj = jax.jit(merge_math)
    r["fuse: merge gather+math"] = timeit(lambda: mj(cb_all, im))

    # stage E: final combined scatter
    def final_scatter(d, cb, win):
        merging = (cb[0] > 0.5).reshape(n_cb)
        target = cb[1].astype(jnp.int32).reshape(n_cb)
        vals = jnp.concatenate(
            [cb[3:].reshape(sm.CHANNELS, n_cb)] * 2, axis=1)
        merge_dst = jnp.where(win, target, N)
        new_mask = (cb[2] > 0.5).reshape(n_cb) & ~merging
        new_i = new_mask.astype(jnp.int32)
        append_dst = smap.count + jnp.cumsum(new_i) - 1
        append_dst = jnp.where(new_mask & (append_dst < N), append_dst, N)
        dst = jnp.concatenate([merge_dst, append_dst])
        return d.at[:, dst].set(vals, mode="drop", unique_indices=True)

    win = jax.block_until_ready(wj2(cb_all))
    fj = jax.jit(final_scatter)
    r["fuse: final scatter+cumsum"] = timeit(lambda: fj(smap.data, cb_all, win))

    # clean + splat for context
    cl = jax.jit(lambda s, i, d, m, p, a: fusion.clean(
        s, i, d, m, 0, p, cam, time_, scfg.time_delta,
        scfg.conf_threshold, scfg, attrs=a))
    r["clean FULL"] = timeit(lambda: cl(smap, im, depth, mask, pose, attrs).data)
    sr = jax.jit(lambda i, a: rasterize.splat_resolve(
        i, cam, scfg.conf_threshold, time_, time_, scfg.time_delta,
        scfg.splat_footprint, attrs=a))
    r["splat_resolve FULL"] = timeit(lambda: sr(im, attrs).color)

    for k, v in sorted(r.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
