"""Decompose predict_indices cost: transform vs project/pack vs scatter vs
decode, on realistic surfel data.

Usage: python tools/microbench_predict.py
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
    from multimotionfusion_tpu.config import CameraModel
    from multimotionfusion_tpu.model import surfel_map as sm
    from multimotionfusion_tpu.ops import rasterize
    from multimotionfusion_tpu.utils import se3

    cam = CameraModel()
    n = 393216
    key = jax.random.PRNGKey(0)
    # realistic surfels: points in the frustum
    z = jax.random.uniform(key, (n,), jnp.float32, 0.5, 3.0)
    u = jax.random.uniform(key, (n,), jnp.float32, 0, cam.width)
    v = jax.random.uniform(key, (n,), jnp.float32, 0, cam.height)
    data = jnp.zeros((sm.CHANNELS, n), jnp.float32)
    data = data.at[sm.PX].set((u - cam.cx) / cam.fx * z)
    data = data.at[sm.PY].set((v - cam.cy) / cam.fy * z)
    data = data.at[sm.PZ].set(z)
    data = data.at[sm.NZ].set(-1.0)
    data = data.at[sm.RADIUS].set(0.005)
    data = data.at[sm.CONF].set(11.0)
    data = data.at[sm.LAST_T].set(5.0)
    data = data.at[sm.ALIVE].set(1.0)
    smap = sm.SurfelMap(data=data, count=jnp.int32(n))
    pose = jnp.eye(4, dtype=jnp.float32)
    t = 6

    pi = jax.jit(
        lambda s, p: rasterize.predict_indices(s, p, cam, t, 200, 3.0)
    )
    print("predict_indices full:", timeit(lambda: pi(smap, pose).index), "ms")

    tr = jax.jit(lambda d, p: sm.transform_surfels(d, se3.inverse_T(p)))
    dl = tr(data, pose)
    print("transform_surfels:", timeit(lambda: tr(data, pose)), "ms")

    def proj_pack_scatter(dl):
        zz = dl[sm.PZ]
        ok = (dl[sm.ALIVE] > 0) & (zz > 0) & (zz <= 3.0)
        u, v, inb = rasterize._project_pixels(dl, cam, 1)
        idx, zmin = rasterize._zmin_scatter(
            u, v, zz, ok & inb, cam.height, cam.width
        )
        return idx

    pps = jax.jit(proj_pack_scatter)
    print("project+pack+scatter+decode:", timeit(lambda: pps(dl)), "ms")

    # gather_attr_images on the result
    idx = pps(dl)
    ga = jax.jit(rasterize.gather_attr_images)
    print("gather_attr_images:", timeit(lambda: ga(dl, idx)), "ms")

    # splat_resolve
    attrs = ga(dl, idx)
    im = rasterize.IndexMap(index=idx, data_local=dl)
    sr = jax.jit(
        lambda i, a: rasterize.splat_resolve(i, cam, 10.0, t, t, 200, 5, attrs=a)
    )
    print("splat_resolve:", timeit(lambda: sr(im, attrs).color), "ms")

    # 16-channel scatter (the compaction op) for scale
    dest = jax.random.randint(key, (n,), 0, n, jnp.int32)

    @jax.jit
    def scat16(d, dest):
        return jnp.zeros((sm.CHANNELS, n + 1), jnp.float32).at[:, dest].set(
            d, mode="drop", unique_indices=True
        )

    print("16ch scatter set n->n:", timeit(lambda: scat16(data, dest)), "ms")


if __name__ == "__main__":
    main()
