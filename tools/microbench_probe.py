"""Probe layout/shape effects on gather+scatter cost (TPU).

Usage: python tools/microbench_probe.py
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
    n = 393216
    h, w = 480, 640
    data = jax.random.normal(key, (16, n), jnp.float32)
    idx2d = jax.random.randint(key, (h, w), 0, n, jnp.int32)
    idx1d = idx2d.reshape(-1)

    print("gather [16,N] by [H,W] -> [16,H,W]:",
          timeit(jax.jit(lambda d, i: d[:, i]), data, idx2d))
    print("gather [16,N] by [HW] -> [16,HW]:",
          timeit(jax.jit(lambda d, i: d[:, i]), data, idx1d))
    print("gather [N,16] by [HW] -> [HW,16]:",
          timeit(jax.jit(lambda d, i: d[i]), data.T.copy(), idx1d))
    d1 = data[0]
    print("gather [N] by [HW]:",
          timeit(jax.jit(lambda d, i: d[i]), d1, idx1d))
    print("gather [N] by [H,W] -> [H,W]:",
          timeit(jax.jit(lambda d, i: d[i]), d1, idx2d))

    # scatter-min: flat pix vs from-2d computed pix
    u = jax.random.randint(key, (n,), 0, w, jnp.int32)
    v = jax.random.randint(key, (n,), 0, h, jnp.int32)
    val = jax.random.randint(key, (n,), 0, 2**30, jnp.int32)

    @jax.jit
    def scat_uv(u, v, val):
        pix = v * w + u
        return jnp.full((h * w,), 2**31 - 1, jnp.int32).at[pix].min(
            val, mode="drop"
        )

    print("scatter-min from u,v:", timeit(scat_uv, u, v, val))

    # full predict-shaped pipeline minus transform: float math -> pack -> scatter
    z = jax.random.uniform(key, (n,), jnp.float32, 0.5, 3.0)
    px = jax.random.uniform(key, (n,), jnp.float32, -1, 1) * z
    py = jax.random.uniform(key, (n,), jnp.float32, -0.7, 0.7) * z

    @jax.jit
    def pipeline(px, py, z):
        fu = jnp.rint(px * 528.0 / z + 320.0).astype(jnp.int32)
        fv = jnp.rint(py * 528.0 / z + 240.0).astype(jnp.int32)
        ok = (fu >= 0) & (fv >= 0) & (fu < w) & (fv < h)
        zq = (jnp.log2(jnp.maximum(z, 1e-6)) + 4.0) * 256.0
        zqi = jnp.clip(zq.astype(jnp.int32), 0, 2046)
        ids = jnp.arange(n, dtype=jnp.int32)
        keyv = jnp.where(ok, (zqi << 20) | ids, 2**31 - 1)
        pix = jnp.where(ok, fv * w + fu, h * w)
        kmin = jnp.full((h * w,), 2**31 - 1, jnp.int32).at[pix].min(
            keyv, mode="drop"
        )
        return kmin

    print("pipeline proj+pack+scatter:", timeit(pipeline, px, py, z))

    # transform_surfels variants
    from multimotionfusion_tpu.model import surfel_map as sm

    T = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(jnp.array([0.1, 0.2, 0.3]))
    sdata = jax.random.normal(key, (16, n), jnp.float32)

    print("transform_surfels (at-set rows):",
          timeit(jax.jit(sm.transform_surfels), sdata, T))

    def tf_concat(d, T):
        R = T[:3, :3]
        t = T[:3, 3]
        px, py, pz = d[0], d[1], d[2]
        nx, ny, nz = d[9], d[10], d[11]
        rows = [
            R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + t[0],
            R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + t[1],
            R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + t[2],
            d[3], d[4], d[5], d[6], d[7], d[8],
            R[0, 0] * nx + R[0, 1] * ny + R[0, 2] * nz,
            R[1, 0] * nx + R[1, 1] * ny + R[1, 2] * nz,
            R[2, 0] * nx + R[2, 1] * ny + R[2, 2] * nz,
            d[12], d[13], d[14], d[15],
        ]
        return jnp.stack(rows, axis=0)

    print("transform_surfels (stack):", timeit(jax.jit(tf_concat), sdata, T))

    def tf_matmul(d, T):
        # positions/normals via one [16,16] channel-mixing matmul
        mix = jnp.zeros((16, 16), jnp.float32)
        mix = mix.at[0:3, 0:3].set(T[:3, :3])
        mix = mix.at[9:12, 9:12].set(T[:3, :3])
        for c in (3, 4, 5, 6, 7, 8, 12, 13, 14, 15):
            mix = mix.at[c, c].set(1.0)
        out = jax.lax.dot_general(
            mix, d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.at[0:3].add(T[:3, 3][:, None])

    print("transform_surfels (mix matmul):", timeit(jax.jit(tf_matmul), sdata, T))


if __name__ == "__main__":
    main()
