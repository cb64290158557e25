"""Sub-stage device timings of flow_crf_segmentation at bench shapes.

Usage: python tools/profile_seg.py [--reps 20]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    R = args.reps

    from multimotionfusion_tpu.config import CameraModel, SegmentationConfig
    from multimotionfusion_tpu.ops import image as imops
    from multimotionfusion_tpu.segmentation import components, crf
    from multimotionfusion_tpu.segmentation import flow_crf as seg
    from multimotionfusion_tpu.segmentation.flow import dense_flow

    cam = CameraModel()
    cfg = SegmentationConfig()
    h, w = cam.height, cam.width
    hc, wc = int(h * cfg.scale), int(w * cfg.scale)
    m = 6
    n_labels = m + 1
    key = jax.random.PRNGKey(0)
    k = jax.random.split(key, 8)
    prev_i = jax.random.uniform(k[0], (h, w))
    next_i = jax.random.uniform(k[1], (h, w))
    depth = jax.random.uniform(k[2], (h, w), minval=0.5, maxval=3.0)
    pred_depth_c = jax.random.uniform(k[3], (m, hc, wc), minval=0.5, maxval=3.0)
    model_active = jnp.ones((m,), bool)
    T = 512
    txy = jax.random.uniform(k[4], (T, 2), maxval=float(w))
    tvel = jax.random.uniform(k[5], (m, T), maxval=3.0)
    tvalid = jnp.ones((T,), bool)

    res = {}

    full = jax.jit(
        lambda pi, ni, d, pd: seg.flow_crf_segmentation(
            pi, ni, d, pd, model_active, txy, tvel, tvalid, cam, cfg,
            pred_at_crf_scale=True,
        ).mask
    )
    res["FULL flow_crf_segmentation"] = timeit(
        lambda: full(prev_i, next_i, depth, pred_depth_c), R
    )

    rs = jax.jit(lambda a: imops.resize_bilinear(a, (hc, wc)))
    prev_c = rs(prev_i)
    next_c = rs(next_i)
    res["resize x3"] = timeit(
        lambda: [rs(prev_i), rs(next_i), rs(depth)], R
    )
    df = jax.jit(dense_flow)
    flow = df(prev_c, next_c)
    res["dense_flow"] = timeit(lambda: df(prev_c, next_c), R)

    depth_c = rs(depth)
    rp = jax.jit(
        lambda dc, pd: seg.reprojection_probability(dc, pd, model_active,
                                                    cfg.sigma_depth)
    )
    res["reprojection_probability"] = timeit(lambda: rp(depth_c, pred_depth_c), R)

    su = jax.jit(
        lambda xy, v: seg.sparse_unary(
            xy, v, tvalid, model_active, hc, wc, cfg.scale,
            cfg.velocity_threshold, True,
        )
    )
    unary_err = su(txy, tvel)
    res["sparse_unary"] = timeit(lambda: su(txy, tvel), R)

    @jax.jit
    def mf(ue, fl):
        e = jnp.exp(-ue)
        esum = jnp.sum(e, axis=0)
        probs = jnp.where(esum[None] > 0, e / jnp.maximum(esum[None], 1e-12),
                          1.0 / n_labels)
        unary = -jnp.log(jnp.maximum(probs, 1e-12))
        return crf.mean_field(
            unary,
            kernels=[
                ("gaussian", dict(sigma=cfg.pairwise_gaussian_sigma),
                 4.0 * cfg.pairwise_gaussian_weight),
                ("bilateral",
                 dict(features=fl * 10.0, sigma_xy=cfg.pairwise_flow_sigma_xy,
                      sigma_f=10.0 * cfg.pairwise_flow_sigma_v),
                 cfg.pairwise_flow_weight),
            ],
            iterations=cfg.crf_iterations,
        )

    q = mf(unary_err, flow)
    res["crf.mean_field"] = timeit(lambda: mf(unary_err, flow), R)

    lbl = jnp.argmax(q, axis=0)
    ls = jax.jit(
        lambda l: components.keep_largest_components_batched(
            jnp.stack([l == i for i in range(n_labels)])
        )
    )
    largest = ls(lbl)
    res["keep_largest_components_batched"] = timeit(lambda: ls(lbl), R)

    segm = jnp.argmax(largest, axis=0).astype(jnp.int32)

    @jax.jit
    def depth_stats(full_lbl, d):
        dsum = jnp.zeros((m + 1,))
        dsq = jnp.zeros((m + 1,))
        dcnt = jnp.zeros((m + 1,))
        for l in range(m + 1):
            sel = (full_lbl == l) & (d > 0)
            dsum = dsum.at[l].set(jnp.sum(jnp.where(sel, d, 0.0)))
            dsq = dsq.at[l].set(jnp.sum(jnp.where(sel, d**2, 0.0)))
            dcnt = dcnt.at[l].set(jnp.sum(sel.astype(jnp.float32)))
        return dsum, dsq, dcnt

    ys = jnp.clip((jnp.arange(h) * cfg.scale).astype(jnp.int32), 0, hc - 1)
    xs = jnp.clip((jnp.arange(w) * cfg.scale).astype(jnp.int32), 0, wc - 1)
    full_lbl = segm[ys[:, None], xs[None, :]]
    res["depth_stats fullres x7"] = timeit(lambda: depth_stats(full_lbl, depth), R)

    print(f"\nhc={hc} wc={wc} labels={n_labels}")
    for kk, v in sorted(res.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.2f} ms  {kk}")


if __name__ == "__main__":
    main()
