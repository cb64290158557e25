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
    gx, gy = imops.sobel_gradients(prev)
    gx = gx * (1.0 / 8.0)
    gy = gy * (1.0 / 8.0)

    def box(x):
        # separable box filter of (2r+1)^2 via cumulative shifts
        acc = jnp.zeros_like(x)
        for d in range(-radius, radius + 1):
            acc = acc + jnp.roll(x, -d, axis=0)
        out = jnp.zeros_like(x)
        for d in range(-radius, radius + 1):
            out = out + jnp.roll(acc, -d, axis=1)
        return out

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

    fx, fy = flow
    for _ in range(iters):
        warped = imops.bilinear_sample(nxt, xs + fx, ys + fy)
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
