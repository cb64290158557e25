"""Microbenchmarks of the scatter/gather/stencil primitives the frame step
is built from, on the real chip. Guides kernel-level optimisation; results
are printed, nothing is persisted.

Usage: python tools/microbench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimotionfusion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

C = 16
N = 393216  # production bucket
NPIX = 76800  # checkerboard subgrid 240x320
H, W = 480, 640


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
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (C, N), jnp.float32)
    data_t = jnp.asarray(data.T)  # [N, C]
    vals2 = jax.random.normal(key, (C, 2 * NPIX), jnp.float32)
    vals2_t = jnp.asarray(vals2.T)
    idx2 = jax.random.permutation(key, N)[: 2 * NPIX].astype(jnp.int32)
    idxN = jax.random.permutation(key, N).astype(jnp.int32)
    valsN = jax.random.normal(key, (C, N), jnp.float32)
    img_idx = jax.random.randint(key, (H, W), -1, N, jnp.int32)

    r = {}

    @jax.jit
    def scat_col_153k(d, i, v):
        return d.at[:, i].set(v, mode="drop", unique_indices=True)

    r["scatter [16,N] cols @153k"] = timeit(scat_col_153k, data, idx2, vals2)

    @jax.jit
    def scat_col_393k(d, i, v):
        return d.at[:, i].set(v, mode="drop", unique_indices=True)

    r["scatter [16,N] cols @393k"] = timeit(scat_col_393k, data, idxN, valsN)

    @jax.jit
    def scat_row_153k(d, i, v):
        return d.at[i].set(v, mode="drop", unique_indices=True)

    r["scatter [N,16] rows @153k"] = timeit(scat_row_153k, data_t, idx2, vals2_t)

    @jax.jit
    def scat_row_393k(d, i, v):
        return d.at[i].set(v, mode="drop", unique_indices=True)

    r["scatter [N,16] rows @393k"] = timeit(
        scat_row_393k, data_t, idxN, jnp.asarray(valsN.T)
    )

    @jax.jit
    def scat_1d_min(i, v):
        return jnp.full((N,), 3.4e38, jnp.float32).at[i].min(v, mode="drop")

    r["scatter-min 1d @307k"] = timeit(
        scat_1d_min,
        img_idx.reshape(-1) % N,
        jax.random.normal(key, (H * W,), jnp.float32),
    )

    @jax.jit
    def gather_imgs(d, i):
        safe = jnp.maximum(i, 0)
        return d[:, safe]

    r["gather [16,N] -> [16,H,W]"] = timeit(gather_imgs, data, img_idx)

    # single-channel variants
    @jax.jit
    def scat_1ch(d, i, v):
        return d.at[i].set(v, mode="drop", unique_indices=True)

    r["scatter 1ch [N] @393k"] = timeit(
        scat_1ch, data[0], idxN, valsN[0]
    )

    # per-channel loop (16 separate 1d scatters)
    @jax.jit
    def scat_loop(d, i, v):
        out = []
        for c in range(C):
            out.append(d[c].at[i].set(v[c], mode="drop", unique_indices=True))
        return jnp.stack(out)

    r["scatter 16x 1d loops @393k"] = timeit(scat_loop, data, idxN, valsN)

    # one-hot matmul "scatter" for the checkerboard (153k x N too big; try
    # segment-sum style: N rows as 3072 x 128 tiles) -- skipped, just report.

    # stencil tap cost: 16 rolls + compare over [H,W] images, 8 channels
    imgs = jax.random.normal(key, (8, H, W), jnp.float32)

    @jax.jit
    def taps(a):
        best = jnp.full((H, W), 1e9)
        for dy in range(-2, 2):
            for dx in range(-2, 2):
                c = jnp.roll(a, (-dy, -dx), axis=(1, 2))
                d = jnp.sqrt(c[0] ** 2 + c[1] ** 2 + c[2] ** 2) + c[3] * c[4]
                best = jnp.minimum(best, d)
        return best

    r["16 roll-taps over 8ch imgs"] = timeit(taps, imgs)

    for k, v in sorted(r.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
