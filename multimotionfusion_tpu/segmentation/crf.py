"""Dense CRF mean-field inference on images.

The reference uses Krähenbühl's DenseCRF with permutohedral-lattice message
passing on the CPU (external densecrf fork; Segmentation.cpp:1124-1161).
The permutohedral lattice is a pointer-chasing structure; on TPU the same
fully-connected Gaussian/bilateral message passing is approximated by
splat-blur-slice on a regular bilateral grid — for the flow-CRF's feature
spaces ((x, y) smoothness and (x, y, flow_x, flow_y) appearance kernels at
1/4 resolution) a coarse grid reproduces the lattice's behaviour to within
label-map parity.

`mean_field` mirrors DenseCRF::inference: Q0 = softmax(-unary); per iteration
message = sum_k w_k (G_k * Q) (excluding self), compatibility = Potts,
Q = softmax(-unary - message).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.ops import image as imops


def _blur_batch(x: jnp.ndarray, sigma: float, radius: int) -> jnp.ndarray:
    """Separable Gaussian blur over the last two axes of [..., H, W].

    One batched conv per axis regardless of how many leading channels — the
    per-channel Python loops the naive formulation needs explode compile time
    (the flow-CRF would unroll thousands of convolutions).
    """
    import numpy as np

    taps = np.exp(-0.5 * (np.arange(-radius, radius + 1) / sigma) ** 2)
    taps = (taps / taps.sum()).astype(np.float32)
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    xb = x.reshape(-1, h, w)
    # shift-accumulate, NOT lax.conv: a C=1 conv lowers through im2col on
    # TPU (~4.6 ms for the flow-CRF blur); the shifted adds fuse on the VPU
    pad = jnp.pad(xb, ((0, 0), (radius, radius), (0, 0)))
    out = jnp.zeros_like(xb)
    for i, t in enumerate(taps):
        out = out + float(t) * jax.lax.dynamic_slice_in_dim(pad, i, h, 1)
    pad = jnp.pad(out, ((0, 0), (0, 0), (radius, radius)))
    out = jnp.zeros_like(xb)
    for i, t in enumerate(taps):
        out = out + float(t) * jax.lax.dynamic_slice_in_dim(pad, i, w, 2)
    return out.reshape(*lead, h, w)


def gaussian_message(q: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian-kernel message for all labels: [H, W, L] -> [H, W, L]."""
    radius = max(1, int(2.0 * sigma))
    return jnp.moveaxis(_blur_batch(jnp.moveaxis(q, -1, 0), sigma, radius), 0, -1)


def bilateral_grid_message(
    q: jnp.ndarray,  # [H, W, L]
    features: jnp.ndarray,  # [H, W, F] extra feature channels (e.g. flow)
    sigma_xy: float,
    sigma_f: float,
    grid_bins: int = 8,
) -> jnp.ndarray:
    """Bilateral message: Gaussian in (x, y, features) via a bilateral grid.

    Each pixel splats Q into one of `grid_bins` bins per feature channel
    (product space flattened), the grid is blurred spatially per slab and
    across the feature axis, then sliced back. With F feature channels the
    grid has grid_bins**F slabs; the flow-CRF uses F=2 (flow_x, flow_y).
    """
    h, w, nl = q.shape
    f = features.shape[-1]
    # normalise features to bin coordinates
    fmin = jnp.min(features.reshape(-1, f), axis=0)
    fmax = jnp.max(features.reshape(-1, f), axis=0)
    scale = (grid_bins - 1) / jnp.maximum(fmax - fmin, 1e-6)
    bins = jnp.clip(jnp.rint((features - fmin) * scale), 0, grid_bins - 1).astype(
        jnp.int32
    )  # [H, W, F]
    flat_bin = bins[..., 0]
    for i in range(1, f):
        flat_bin = flat_bin * grid_bins + bins[..., i]
    nslab = grid_bins**f

    # splat: one-hot over slabs (nslab small) -> [H, W, nslab, L]
    onehot = jax.nn.one_hot(flat_bin, nslab, dtype=q.dtype)
    grid = onehot[..., None] * q[..., None, :]  # [H, W, nslab, L]

    # blur spatially, all slabs and labels in one batched conv
    sig = sigma_xy
    radius = max(1, min(int(1.5 * sig), 24))
    grid = jnp.moveaxis(
        _blur_batch(jnp.moveaxis(grid.reshape(h, w, nslab * nl), -1, 0), sig, radius),
        0, -1,
    ).reshape(h, w, nslab, nl)
    occ = jnp.moveaxis(
        _blur_batch(jnp.moveaxis(onehot, -1, 0), sig, radius), 0, -1
    )  # [H, W, nslab]

    # blur across the feature axis (separable per feature dim)
    sigma_bins = sigma_f * scale  # [F] in bin units
    grid = grid.reshape(h, w, *([grid_bins] * f), nl)
    occ = occ.reshape(h, w, *([grid_bins] * f))
    for i in range(f):
        axis = 2 + i
        sb = jnp.maximum(sigma_bins[i], 1e-3)
        offs = list(range(-2, 3))
        wts = jnp.exp(-0.5 * (jnp.asarray(offs, q.dtype) / sb) ** 2)
        wts = wts / jnp.sum(wts)
        grid = sum(wts[k] * jnp.roll(grid, off, axis=axis) for k, off in enumerate(offs))
        occ = sum(wts[k] * jnp.roll(occ, off, axis=axis) for k, off in enumerate(offs))
    grid = grid.reshape(h, w, nslab, nl)
    occ = occ.reshape(h, w, nslab)

    # slice: read back at each pixel's own bin
    msg = jnp.take_along_axis(grid, flat_bin[..., None, None], axis=2)[..., 0, :]
    norm = jnp.take_along_axis(occ, flat_bin[..., None], axis=2)[..., 0]
    return msg / jnp.maximum(norm, 1e-6)[..., None]


def mean_field(
    unary: jnp.ndarray,  # [H, W, L] negative log-probabilities
    kernels: Sequence[Tuple[str, dict, float]],  # (type, params, weight)
    iterations: int,
) -> jnp.ndarray:
    """Potts-model mean-field (DenseCRF::inference). Returns Q [H, W, L]."""
    q = jax.nn.softmax(-unary, axis=-1)
    for _ in range(iterations):
        msg = jnp.zeros_like(q)
        for kind, params, weight in kernels:
            if kind == "gaussian":
                m = gaussian_message(q, **params)
            elif kind == "bilateral":
                m = bilateral_grid_message(q, **params)
            else:
                raise ValueError(kind)
            msg = msg + weight * (m - q)  # exclude self-message
        # Potts compatibility: penalty = sum of other-label messages
        pairwise = jnp.sum(msg, axis=-1, keepdims=True) - msg
        q = jax.nn.softmax(-unary - pairwise, axis=-1)
    return q
