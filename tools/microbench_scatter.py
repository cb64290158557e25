"""Microbenchmarks for the rasterisation primitives: scatter-min cost vs key
count and buffer size, and 1-channel gather cost vs index count. Decides the
composite multi-model render design (one flat scatter + own-gather vs
per-model buffers).

Usage: python tools/microbench_scatter.py
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


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
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
    results = []
    for n_keys in (131072, 262144, 393216, 524288, 786432, 1048576):
        for buf in (307200, 307200 * 6):
            pix = jax.random.randint(key, (n_keys,), 0, buf, jnp.int32)
            val = jax.random.randint(key, (n_keys,), 0, 2**30, jnp.int32)

            @jax.jit
            def scat(pix, val, buf=buf):
                return jnp.full((buf,), 2**31 - 1, jnp.int32).at[pix].min(
                    val, mode="drop"
                )

            ms = timeit(scat, pix, val)
            results.append(("scatter_min", n_keys, buf, ms))
            print(f"scatter-min keys={n_keys:8d} buf={buf:8d}: {ms:7.3f} ms")

    for n_idx in (131072, 307200, 524288, 1048576):
        src = jax.random.normal(key, (307200,), jnp.float32)
        idx = jax.random.randint(key, (n_idx,), 0, 307200, jnp.int32)

        @jax.jit
        def gath(src, idx):
            return src[idx]

        ms = timeit(gath, src, idx)
        print(f"gather 1ch  idx={n_idx:8d} src=307200: {ms:7.3f} ms")

    # gather from a small int image with 2D layout (the own-at-pixel gather)
    own = jax.random.randint(key, (480, 640), 0, 6, jnp.int32).reshape(-1)
    for n_idx in (307200, 524288, 1048576):
        idx = jax.random.randint(key, (n_idx,), 0, 307200, jnp.int32)

        @jax.jit
        def gown(own, idx):
            return own[idx]

        ms = timeit(gown, own, idx)
        print(f"own-gather  idx={n_idx:8d}: {ms:7.3f} ms")

    # 16-channel gather (attrs) for reference
    data = jax.random.normal(key, (16, 393216), jnp.float32)
    idx = jax.random.randint(key, (307200,), 0, 393216, jnp.int32)

    @jax.jit
    def gattr(data, idx):
        return data[:, idx]

    print(f"gather 16ch idx=307200 src=393216: {timeit(gattr, data, idx):7.3f} ms")

    # segmented cumsum (fuse append destinations): [76800, 6]
    oh = jax.random.normal(key, (76800, 8), jnp.float32)

    @jax.jit
    def segcum(oh):
        return jnp.cumsum(oh, axis=0)

    print(f"cumsum [76800, 8] axis0: {timeit(segcum, oh):7.3f} ms")


if __name__ == "__main__":
    main()
