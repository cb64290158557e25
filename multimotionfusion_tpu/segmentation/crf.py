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


def _box_sum(x: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    """Windowed sum over [i-r, i+r] along `axis` (zero outside), via cumsum.

    O(1) per pixel regardless of r — the CRF's spatial sigmas reach 40 px,
    where tap-based blurs move ~80x the data.
    """
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    cs = jnp.cumsum(jnp.pad(x, pad), axis=axis)
    hi = jax.lax.slice_in_dim(cs, 2 * r, 2 * r + n, axis=axis)
    csp_pad = [(0, 0)] * x.ndim
    csp_pad[axis] = (1, 0)
    csp = jnp.pad(cs, csp_pad)
    lo = jax.lax.slice_in_dim(csp, 0, n, axis=axis)
    return hi - lo


def _blur_batch(x: jnp.ndarray, sigma: float, radius: int) -> jnp.ndarray:
    """Separable Gaussian blur over the last two axes of [..., H, W].

    Small sigmas: batched shift-accumulate taps (NOT lax.conv — a C=1 conv
    lowers through im2col on TPU). Large sigmas: THREE box passes per axis
    (Wells' box-approximation of a Gaussian; box width w = sqrt(4 sigma^2 + 1))
    via cumsum — O(1) per pixel instead of O(sigma) taps, which is what makes
    the CRF's sigma-40 appearance kernel affordable (the tap form moved
    ~3 GB/iteration through the 448-channel bilateral grid).
    """
    import math

    import numpy as np

    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    xb = x.reshape(-1, h, w)
    if radius > 4:
        r = max(1, int(round((math.sqrt(4.0 * sigma * sigma + 1.0) - 1.0) / 2)))
        inv = 1.0 / float(2 * r + 1)
        out = xb
        for axis in (1, 2):
            for _ in range(3):
                out = _box_sum(out, r, axis) * inv
        return out.reshape(*lead, h, w)

    taps = np.exp(-0.5 * (np.arange(-radius, radius + 1) / sigma) ** 2)
    taps = (taps / taps.sum()).astype(np.float32)
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
    """Gaussian-kernel message for all labels: [L, H, W] -> [L, H, W]."""
    radius = max(1, int(2.0 * sigma))
    return _blur_batch(q, sigma, radius)


def bilateral_grid_message(
    q: jnp.ndarray,  # [L, H, W]
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

    Everything is CHANNEL-FIRST ([slabs*L, H, W]) so the image width rides
    the TPU lane axis — the label-minor layout ran every elementwise op at
    L/128 lane utilisation and made this THE hottest op of the multi-model
    frame (measured 12 ms/iteration at 160x120xL7 before the transpose).
    """
    nl, h, w = q.shape
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

    # splat: one-hot over slabs -> [S, L, H, W] (channel-first throughout)
    onehot = (
        flat_bin[None] == jnp.arange(nslab, dtype=jnp.int32)[:, None, None]
    ).astype(q.dtype)  # [S, H, W]
    grid = (onehot[:, None] * q[None]).reshape(nslab * nl, h, w)

    # spatial blur on a 4x-DOWNSAMPLED grid: the spatial sigma (40 px at CRF
    # scale) wipes out everything finer than the pooling, so pool -> blur at
    # sigma/4 -> nearest-upsample is equivalent to within mean-field noise
    # while touching 1/16 of the 448-channel grid (the full-res blur was THE
    # hottest op of the multi-model frame at ~14 ms; XLA runs these small
    # many-op stencil pipelines far from bandwidth anyway)
    ds = 4 if (h % 4 == 0 and w % 4 == 0 and min(h, w) >= 32) else 1
    hc2, wc2 = h // ds, w // ds
    if ds > 1:
        grid = grid.reshape(nslab * nl, hc2, ds, wc2, ds).mean(axis=(2, 4))
        occ = onehot.reshape(nslab, hc2, ds, wc2, ds).mean(axis=(2, 4))
    else:
        occ = onehot
    sig = sigma_xy / ds
    radius = max(1, min(int(1.5 * sig), 24))
    grid = _blur_batch(grid, sig, radius).reshape(nslab, nl, hc2, wc2)
    occ = _blur_batch(occ, sig, radius)  # [S, hc2, wc2]

    # blur across the feature axis (separable per feature dim; major axes)
    sigma_bins = sigma_f * scale  # [F] in bin units
    grid = grid.reshape(*([grid_bins] * f), nl, hc2, wc2)
    occ = occ.reshape(*([grid_bins] * f), hc2, wc2)
    for i in range(f):
        sb = jnp.maximum(sigma_bins[i], 1e-3)
        offs = list(range(-2, 3))
        wts = jnp.exp(-0.5 * (jnp.asarray(offs, q.dtype) / sb) ** 2)
        wts = wts / jnp.sum(wts)
        grid = sum(
            wts[k] * jnp.roll(grid, off, axis=i) for k, off in enumerate(offs)
        )
        occ = sum(
            wts[k] * jnp.roll(occ, off, axis=i) for k, off in enumerate(offs)
        )
    grid = grid.reshape(nslab, nl, hc2, wc2)
    occ = occ.reshape(nslab, hc2, wc2)
    if ds > 1:
        grid = jnp.repeat(jnp.repeat(grid, ds, axis=2), ds, axis=3)
        occ = jnp.repeat(jnp.repeat(occ, ds, axis=1), ds, axis=2)

    # slice: read back at each pixel's own bin (one-hot contraction — a
    # take_along_axis over a lane-minor slab axis would be a relayout)
    msg = jnp.einsum("shw,slhw->lhw", onehot, grid)
    norm = jnp.einsum("shw,shw->hw", onehot, occ)
    return msg / jnp.maximum(norm, 1e-6)[None]


def mean_field(
    unary: jnp.ndarray,  # [L, H, W] negative log-probabilities
    kernels: Sequence[Tuple[str, dict, float]],  # (type, params, weight)
    iterations: int,
) -> jnp.ndarray:
    """Potts-model mean-field (DenseCRF::inference). Returns Q [L, H, W]."""
    q = jax.nn.softmax(-unary, axis=0)
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
        pairwise = jnp.sum(msg, axis=0, keepdims=True) - msg
        q = jax.nn.softmax(-unary - pairwise, axis=0)
    return q
