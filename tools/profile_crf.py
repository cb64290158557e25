"""Honest (dependency-chained) timings of the flow-CRF pieces on the TPU.

The tunnel backend elides independent repeated dispatches, so each repeat
feeds its output back into the next call's input — timings include real
execution.

Usage: python tools/profile_crf.py
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


def chained(fn, x, reps=10):
    """fn must map x -> array broadcastable back to x's shape."""
    out = fn(x)
    jax.block_until_ready(out)
    best = []
    for _ in range(3):
        cur = x
        t0 = time.perf_counter()
        for _ in range(reps):
            cur = fn(cur)
        jax.block_until_ready(cur)
        best.append((time.perf_counter() - t0) / reps * 1e3)
    return sorted(best)[1]


def main():
    from multimotionfusion_tpu.config import SegmentationConfig
    from multimotionfusion_tpu.segmentation import components, crf

    cfg = SegmentationConfig()
    hc, wc, L = 120, 160, 6
    key = jax.random.PRNGKey(0)
    unary = jax.random.uniform(key, (L, hc, wc), jnp.float32, 0.0, 3.0)
    flow = jax.random.uniform(key, (hc, wc, 2), jnp.float32, -2.0, 2.0)

    kernels = [
        ("gaussian", dict(sigma=cfg.pairwise_gaussian_sigma),
         4.0 * cfg.pairwise_gaussian_weight),
        ("bilateral",
         dict(features=flow * 10.0, sigma_xy=cfg.pairwise_flow_sigma_xy,
              sigma_f=10.0 * cfg.pairwise_flow_sigma_v),
         cfg.pairwise_flow_weight),
    ]

    mf = jax.jit(
        lambda u: crf.mean_field(u, kernels, cfg.crf_iterations)
    )
    print("mean_field x10 iters:", chained(lambda u: -jnp.log(
        jnp.maximum(mf(u), 1e-12)), unary), "ms")

    mf1 = jax.jit(lambda u: crf.mean_field(u, kernels, 1))
    print("mean_field x1 iter:  ", chained(lambda u: -jnp.log(
        jnp.maximum(mf1(u), 1e-12)), unary), "ms")

    gm = jax.jit(lambda q: crf.gaussian_message(q, cfg.pairwise_gaussian_sigma))
    print("gaussian_message:    ", chained(gm, jax.nn.softmax(-unary)), "ms")

    bg = jax.jit(
        lambda q: crf.bilateral_grid_message(
            q, flow * 10.0, cfg.pairwise_flow_sigma_xy,
            10.0 * cfg.pairwise_flow_sigma_v,
        )
    )
    print("bilateral_message:   ", chained(bg, jax.nn.softmax(-unary)), "ms")

    masks = jax.random.uniform(key, (L + 1, hc, wc)) > 0.7
    cc = jax.jit(components.keep_largest_components_batched)
    print(
        "batched components:  ",
        chained(lambda m: cc(m) | (m & False), masks), "ms",
    )

    # the box-blur primitive itself on the grid shape
    grid = jax.random.normal(key, (448, hc, wc), jnp.float32)
    bb = jax.jit(lambda g: crf._blur_batch(g, 40.0, 24))
    print("blur sigma40 [448ch]:", chained(bb, grid), "ms")
    bb3 = jax.jit(lambda g: crf._blur_batch(g, 3.0, 6))
    print("blur sigma3  [448ch]:", chained(bb3, grid), "ms")


if __name__ == "__main__":
    main()
