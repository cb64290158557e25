"""SLIC superpixels on TPU.

== the reference's gSLICr wrapper (Core/Segmentation/Slic.{h,cpp}: GIVEN_SIZE
segmentation, sp_size=16 px, coh_weight=0.6, 5 iterations, no connectivity
enforcement). gSLICr is a CUDA library; here SLIC is expressed as jittable
grid k-means: each pixel considers the 3x3 neighbouring cluster centres, and
centre updates are segment-mean scatters — both XLA-friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SlicResult(NamedTuple):
    labels: jnp.ndarray  # [H, W] int32 superpixel id (row-major grid order)
    mean_color: jnp.ndarray  # [S, C]
    mean_xy: jnp.ndarray  # [S, 2]
    count: jnp.ndarray  # [S]
    grid_hw: tuple  # (rows, cols) of the superpixel grid


def slic(
    image: jnp.ndarray,  # [H, W, C] features (e.g. RGB 0..255)
    sp_size: int = 16,
    coh_weight: float = 0.6,
    iterations: int = 5,
) -> SlicResult:
    h, w, c = image.shape
    gy = max(h // sp_size, 1)
    gx = max(w // sp_size, 1)
    s = gy * gx

    ys = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0)
    # initial assignment: regular grid
    cell_y = jnp.clip((ys / sp_size).astype(jnp.int32), 0, gy - 1)
    cell_x = jnp.clip((xs / sp_size).astype(jnp.int32), 0, gx - 1)
    labels = cell_y * gx + cell_x

    # spatial/colour balance as in gSLICr: dist = d_color + coh * d_xy / S
    coh = coh_weight / float(sp_size)

    def centres(labels):
        flat = labels.reshape(-1)
        cnt = jnp.zeros((s,), jnp.float32).at[flat].add(1.0)
        col = jnp.zeros((s, c)).at[flat].add(image.reshape(-1, c))
        pxy = jnp.zeros((s, 2)).at[flat].add(
            jnp.stack([xs, ys], -1).reshape(-1, 2)
        )
        denom = jnp.maximum(cnt, 1.0)[:, None]
        return col / denom, pxy / denom, cnt

    for _ in range(iterations):
        mc, mxy, cnt = centres(labels)
        best_d = jnp.full((h, w), jnp.inf)
        best_l = labels
        base_cy = jnp.clip(labels // gx, 0, gy - 1)
        base_cx = jnp.clip(labels % gx, 0, gx - 1)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                cyy = jnp.clip(base_cy + dy, 0, gy - 1)
                cxx = jnp.clip(base_cx + dx, 0, gx - 1)
                cid = cyy * gx + cxx
                dc = jnp.sum((image - mc[cid]) ** 2, axis=-1)
                dxs = (xs - mxy[cid][..., 0]) ** 2 + (ys - mxy[cid][..., 1]) ** 2
                d = jnp.sqrt(dc) + coh * jnp.sqrt(dxs) * jnp.sqrt(
                    jnp.float32(c)
                ) * 255.0 / sp_size
                better = d < best_d
                best_d = jnp.where(better, d, best_d)
                best_l = jnp.where(better, cid, best_l)
        labels = best_l

    mc, mxy, cnt = centres(labels)
    return SlicResult(labels=labels, mean_color=mc, mean_xy=mxy, count=cnt,
                      grid_hw=(gy, gx))


def downsample_to_superpixels(img: jnp.ndarray, res: SlicResult) -> jnp.ndarray:
    """Mean of `img` ([H,W] or [H,W,C]) per superpixel -> [S(,C)]
    (the reference Slic::downsample)."""
    s = res.mean_color.shape[0]
    flat = res.labels.reshape(-1)
    if img.ndim == 2:
        acc = jnp.zeros((s,)).at[flat].add(img.reshape(-1))
        return acc / jnp.maximum(res.count, 1.0)
    acc = jnp.zeros((s, img.shape[-1])).at[flat].add(img.reshape(-1, img.shape[-1]))
    return acc / jnp.maximum(res.count, 1.0)[:, None]


def upsample_from_superpixels(values: jnp.ndarray, res: SlicResult) -> jnp.ndarray:
    """[S(,C)] -> full-resolution image via the label map (Slic::upsample)."""
    return values[res.labels]
