"""Bisect WHY the fuse final scatter is ~17 ms while an identical-shaped
isolated scatter is ~0.03 ms. Usage: python tools/profile_scatter.py
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

C = 16
N = 393216
M = 76800


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
    d = jax.random.normal(key, (C, N), jnp.float32)
    v = jax.random.normal(key, (C, 2 * M), jnp.float32)
    # dst with many out-of-range sentinels (like production: ~90% dropped)
    keep = jax.random.uniform(key, (2 * M,)) < 0.1
    perm = jax.random.permutation(key, N)[: 2 * M].astype(jnp.int32)
    dst_dups = jnp.where(keep, perm, N)
    dst_clean = perm
    new_mask = jax.random.uniform(key, (M,)) < 0.05

    r = {}

    @jax.jit
    def s_clean(d, i, v):
        return d.at[:, i].set(v, mode="drop", unique_indices=True)

    r["scatter clean unique idx"] = timeit(s_clean, d, dst_clean, v)

    @jax.jit
    def s_dups(d, i, v):
        return d.at[:, i].set(v, mode="drop", unique_indices=True)

    r["scatter w/ 90% N-sentinels"] = timeit(s_dups, d, dst_dups, v)

    @jax.jit
    def s_nounique(d, i, v):
        return d.at[:, i].set(v, mode="drop")

    r["scatter no-unique flag"] = timeit(s_nounique, d, dst_dups, v)

    @jax.jit
    def s_cumsum(d, nm, i, v):
        cnt = jnp.zeros((), jnp.int32) + N - 40960
        new_i = nm.astype(jnp.int32)
        app = cnt + jnp.cumsum(new_i) - 1
        app = jnp.where(nm & (app < N), app, N)
        dst = jnp.concatenate([i[:M], app])
        return d.at[:, dst].set(v, mode="drop", unique_indices=True)

    r["scatter + cumsum dst"] = timeit(s_cumsum, d, new_mask, dst_dups, v)

    @jax.jit
    def cumsum_only(nm):
        return jnp.cumsum(nm.astype(jnp.int32))

    r["cumsum only"] = timeit(cumsum_only, new_mask)

    # dst computed from a f32 image (as in production: cb[1].astype)
    img = jax.random.normal(key, (240, 320), jnp.float32)

    @jax.jit
    def s_derived(d, img, v):
        t = (jnp.abs(img.reshape(M)) * N).astype(jnp.int32) % (N + 1)
        dst = jnp.concatenate([t, t])
        return d.at[:, dst].set(v, mode="drop", unique_indices=True)

    r["scatter dst derived from f32 img"] = timeit(s_derived, d, img, v)

    for k, val in sorted(r.items(), key=lambda kv: -kv[1]):
        print(f"{val:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
