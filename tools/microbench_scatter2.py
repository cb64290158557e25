"""Slope-timed (tools/truetime.py) scatter/gather variants at frame shapes.

The original microbench_scatter.py numbers were dispatch artifacts
(block_until_ready does not block on the axon backend). These are real.

Usage: python tools/microbench_scatter2.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from truetime import time_chain  # noqa: E402


def run(name, fn, x):
    ms = time_chain(jax.jit(fn), x, k_lo=8, k_hi=56, outer=5)
    print(f"{ms:8.3f} ms  {name}", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    HW = 307200
    N = 851968
    NCB = 153600

    pix = jax.random.randint(key, (N,), 0, HW, jnp.int32)
    val = jax.random.randint(key, (N,), 0, 2**30, jnp.int32)

    # chained: x is a dummy f32 scalar-ish carrier to serialize steps
    x0 = jnp.zeros((8, 128), jnp.int32)

    def mk(fn):
        def step(x):
            out = fn(x[0, 0])
            return x + out.ravel()[0].astype(jnp.int32)
        return step

    run("scatter-min 852k -> 307k img",
        mk(lambda s: jnp.full((HW,), 2**31 - 1, jnp.int32)
           .at[pix + s].min(val, mode="drop")), x0)

    pix2 = jax.random.randint(key, (N,), 0, 6 * 19200, jnp.int32)
    run("scatter-min 852k -> 6x19200 (rmd)",
        mk(lambda s: jnp.full((6 * 19200,), 2**31 - 1, jnp.int32)
           .at[pix2 + s].min(val, mode="drop")), x0)

    n229 = 229376
    run("scatter-min 229k -> 6x19200",
        mk(lambda s: jnp.full((6 * 19200,), 2**31 - 1, jnp.int32)
           .at[pix2[:n229] + s].min(val[:n229], mode="drop")), x0)

    dst = jax.random.randint(key, (NCB,), 0, N, jnp.int32)
    src_ids = jnp.arange(NCB, dtype=jnp.int32)
    run("inv scatter-min 153k -> 852k",
        mk(lambda s: jnp.full((N,), NCB, jnp.int32)
           .at[dst + s].min(src_ids, mode="drop")), x0)

    vals16 = jax.random.normal(key, (16, NCB), jnp.float32)
    run("row scatter .at[:, dst].set 153k rows -> [16, 852k]",
        mk(lambda s: jnp.zeros((16, N), jnp.float32)
           .at[:, dst + s].set(vals16, mode="drop")), x0)

    vals16t = jnp.asarray(vals16.T)
    run("row scatter .at[dst].set 153k rows -> [852k, 16]",
        mk(lambda s: jnp.zeros((N, 16), jnp.float32)
           .at[dst + s].set(vals16t, mode="drop")), x0)

    inv = jax.random.randint(key, (N,), 0, NCB, jnp.int32)
    run("gather [16ch x 852k idx] from [16, 153k]",
        mk(lambda s: vals16[:, jnp.minimum(inv + s, NCB - 1)]), x0)

    tbl16 = jax.random.normal(key, (16, N), jnp.float32)
    idx_img = jax.random.randint(key, (HW,), 0, N, jnp.int32)
    run("gather [16ch x 307k idx] from [16, 852k] (attrs)",
        mk(lambda s: tbl16[:, jnp.minimum(idx_img + s, N - 1)]), x0)

    tbl16t = jnp.asarray(tbl16.T)
    run("gather rows [307k] from [852k, 16]",
        mk(lambda s: tbl16t[jnp.minimum(idx_img + s, N - 1)]), x0)

    tbl16b = tbl16.astype(jnp.bfloat16)
    run("gather bf16 [16ch x 307k idx] from [16, 852k]",
        mk(lambda s: tbl16b[:, jnp.minimum(idx_img + s, N - 1)]), x0)

    # sort-based rasterisation alternative
    keyv = jax.random.randint(key, (N,), 0, 2**31 - 1, jnp.int32)
    def sort_raster(s):
        p, k2 = jax.lax.sort((pix + s, keyv), num_keys=2)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), p[1:] != p[:-1]]
        )
        return jnp.full((HW,), 2**31 - 1, jnp.int32).at[
            jnp.where(first, p, HW)
        ].min(k2, mode="drop")
    run("sort(852k,2key)+first+scatter", mk(sort_raster), x0)

    # strided subsample: gather vs reshape-slice
    g = jax.random.normal(key, (524288,), jnp.float32)
    run("stride-4 via [::4]", mk(lambda s: g[::4] + s), x0)
    run("stride-4 via reshape[:,0]",
        mk(lambda s: g.reshape(-1, 4)[:, 0] + s), x0)

    # nearest upsample 120x160 -> 480x640: gather vs broadcast-reshape
    sm_img = jax.random.randint(key, (120, 160), 0, 7, jnp.int32)
    ys = jnp.clip((jnp.arange(480) * 0.25).astype(jnp.int32), 0, 119)
    xs = jnp.clip((jnp.arange(640) * 0.25).astype(jnp.int32), 0, 159)
    run("upsample via fancy-index gather",
        mk(lambda s: sm_img[ys[:, None], xs[None, :]] + s), x0)
    run("upsample via broadcast-reshape",
        mk(lambda s: jnp.broadcast_to(
            sm_img[:, None, :, None] + s, (120, 4, 160, 4)
        ).reshape(480, 640)), x0)


if __name__ == "__main__":
    main()
