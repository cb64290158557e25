"""Dense optical flow (prev -> next) at the CRF working scale.

The reference uses OpenCV's Farnebäck flow on the CPU at 1/4 resolution
(Segmentation.cpp:779-817). Farnebäck's polynomial-expansion machinery is a
CPU-era construct; this is a pyramidal iterative Lucas-Kanade dense flow —
same contract (quarter-scale dense flow in pixels), same knobs that matter to
the flow-CRF (it only consumes flow vectors and their magnitude), and it is
pure stencil arithmetic that XLA fuses well on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from multimotionfusion_tpu.ops import image as imops


def _lk_refine(prev: jnp.ndarray, nxt: jnp.ndarray, flow, iters: int, radius: int = 4):
    """Iterative Lucas-Kanade updates at one scale.

    Structure tensor from spatial gradients of `prev`, temporal difference
    against `nxt` warped by the current flow; box-filtered normal equations
    per pixel (the classic KLT window).
    """
    h, w = prev.shape
    # unit-gain central differences. NOT imops.sobel_gradients: those are the
    # odometry-parity taps (gain 3.68, truncated to int16), and dividing them
    # by 8 under-scales the gradient ~2.7x — in LK a gradient scale s makes
    # every update 1/s too large, which is a DIVERGENT iteration (|1-1/s|>1)
    # that the per-iteration clamps merely bound; flow came out several times
    # the true motion. The inputs are pre-blurred, so central differences are
    # well posed.
    gx = 0.5 * (jnp.roll(prev, -1, axis=1) - jnp.roll(prev, 1, axis=1))
    gy = 0.5 * (jnp.roll(prev, -1, axis=0) - jnp.roll(prev, 1, axis=0))
    gx = gx.at[:, 0].set(0.0).at[:, -1].set(0.0)
    gy = gy.at[0, :].set(0.0).at[-1, :].set(0.0)

    def box(x):
        # separable zero-padded box filter of (2r+1)^2. NOT jnp.roll: roll
        # wraps at borders, and on the small coarse pyramid levels the
        # wrapped windows mix opposite image edges into the normal equations,
        # which drives large spurious flow. Zero padding keeps border windows
        # merely smaller — consistent between the structure tensor and the
        # right-hand side, so the per-pixel solve stays well posed.
        k = 2 * radius + 1
        xp = jnp.pad(x, ((radius, radius), (0, 0)))
        acc = sum(xp[d : d + h, :] for d in range(k))
        accp = jnp.pad(acc, ((0, 0), (radius, radius)))
        return sum(accp[:, d : d + w] for d in range(k))

    ixx = box(gx * gx)
    ixy = box(gx * gy)
    iyy = box(gy * gy)
    det = ixx * iyy - ixy * ixy
    # gate on the smaller eigenvalue: weak-texture pixels keep zero flow
    tr = ixx + iyy
    min_eig = tr / 2.0 - jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    ok = (det > 1e-3) & (min_eig > 0.5)
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    # loop-invariant 4-tap bank (f32: flow residuals are small differences of
    # intensities; bf16 rounding there is not zero-mean after the subtract):
    # each warp is ONE gather of all four bilinear corners instead of four
    # (TPU gather cost is per-row — this quarters the warp, the dominant op
    # of the refine loop at the CRF working scale)
    from multimotionfusion_tpu.odometry.rgbd import (
        bilinear_taps, pack_bilinear_bank,
    )

    nxt_bank = pack_bilinear_bank([nxt], dtype=jnp.float32)

    fx, fy = flow
    for _ in range(iters):
        # clamp a hair inside the last pixel: the bank's corner taps live at
        # (u0, u0+1), so u must stay below w-1 for u0 = w-2 edge blending
        wu = jnp.clip(xs + fx, 0.0, w - 1.001)
        wv = jnp.clip(ys + fy, 0.0, h - 1.001)
        taps, tu, tv, _ = bilinear_taps(nxt_bank, wu, wv, 1)
        t00, t01, t10, t11 = (t[..., 0] for t in taps)
        warped = (
            t00 * (1 - tu) * (1 - tv) + t01 * tu * (1 - tv)
            + t10 * (1 - tu) * tv + t11 * tu * tv
        )
        it = warped - prev
        bx = box(gx * it)
        by = box(gy * it)
        dx = -(iyy * bx - ixy * by) * inv_det
        dy = -(-ixy * bx + ixx * by) * inv_det
        # clamp per-iteration updates (LK linearisation validity)
        dx = jnp.clip(dx, -2.0, 2.0)
        dy = jnp.clip(dy, -2.0, 2.0)
        fx = fx + jnp.where(ok, dx, 0.0)
        fy = fy + jnp.where(ok, dy, 0.0)
    return fx, fy


def dense_flow(
    prev: jnp.ndarray,  # [H, W] intensity 0..255 (already at working scale)
    nxt: jnp.ndarray,
    levels: int = 3,
    iters: int = 4,
) -> jnp.ndarray:
    """[H, W, 2] flow in pixels such that nxt(x + flow) ~ prev(x)."""
    # pre-smooth the working level: LK's linearisation needs band-limited
    # inputs (Farneback's polynomial expansion is implicitly low-pass; KLT
    # implementations blur first). Without this, scene content near the pixel
    # scale decorrelates the temporal difference and the flow field comes out
    # several times larger than the true motion.
    prev = imops.gaussian_blur(prev, 1.25, 3)
    nxt = imops.gaussian_blur(nxt, 1.25, 3)
    pyr_p = imops.build_pyramid(prev, levels)
    pyr_n = imops.build_pyramid(nxt, levels)
    h_c, w_c = pyr_p[levels - 1].shape
    fx = jnp.zeros((h_c, w_c), jnp.float32)
    fy = jnp.zeros((h_c, w_c), jnp.float32)
    for lvl in range(levels - 1, -1, -1):
        if lvl < levels - 1:
            h_l, w_l = pyr_p[lvl].shape
            fx = imops.resize_bilinear(fx, (h_l, w_l)) * 2.0
            fy = imops.resize_bilinear(fy, (h_l, w_l)) * 2.0
        fx, fy = _lk_refine(pyr_p[lvl], pyr_n[lvl], (fx, fy), iters)
    return jnp.stack([fx, fy], axis=-1)
