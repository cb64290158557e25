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


def _blur_hw_leading(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian blur over the LEADING two axes of [H, W, C] (channels-last).

    Three box passes per axis (Wells) via cumsum — the channels ride the TPU
    lane axis, so every pass is full-width vector work. Used on the pooled
    bilateral grid whose channel count (slabs x labels = 448) is lane-sized
    while its spatial extent (30 x 40) is tiny.
    """
    import math

    r = max(1, int(round((math.sqrt(4.0 * sigma * sigma + 1.0) - 1.0) / 2)))
    inv = 1.0 / float(2 * r + 1)
    out = x
    for axis in (0, 1):
        for _ in range(3):
            out = _box_sum(out, r, axis) * inv
    return out


def bilateral_grid_splat_plan(
    features: jnp.ndarray,  # [H, W, F] extra feature channels (e.g. flow)
    grid_bins: int = 8,
    pool: int = 4,
):
    """Precompute the iteration-invariant part of bilateral_grid_message.

    The grid assignment (which slab each pixel splats into) depends only on
    the features, which are FIXED across mean-field iterations — only Q
    changes. Returns (oh_blocks [hp, wp, S, ds*ds], sigma_scale [F], ds):
    the per-block one-hot splat matrix that both the splat and the slice
    contract against on the MXU.
    """
    h, w, f = features.shape
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
    ds = pool if (h % pool == 0 and w % pool == 0 and min(h, w) >= 32) else 1
    hp, wp = h // ds, w // ds
    # [hp, wp, S, ds*ds] one-hot: oh[hp, wp, s, a*ds+b] = 1 iff pixel (a, b)
    # of block (hp, wp) falls in slab s
    fb_blocks = (
        flat_bin.reshape(hp, ds, wp, ds).transpose(0, 2, 1, 3).reshape(hp, wp, ds * ds)
    )
    oh_blocks = (
        fb_blocks[:, :, None, :] == jnp.arange(nslab, dtype=jnp.int32)[None, None, :, None]
    ).astype(jnp.float32)
    return oh_blocks, scale, ds


def bilateral_grid_message(
    q: jnp.ndarray,  # [L, H, W]
    features: jnp.ndarray,  # [H, W, F] extra feature channels (e.g. flow)
    sigma_xy: float,
    sigma_f: float,
    grid_bins: int = 8,
    plan=None,  # optional precomputed bilateral_grid_splat_plan(features)
) -> jnp.ndarray:
    """Bilateral message: Gaussian in (x, y, features) via a bilateral grid.

    Each pixel splats Q into one of `grid_bins` bins per feature channel
    (product space flattened), the grid is blurred spatially per slab and
    across the feature axis, then sliced back. With F feature channels the
    grid has grid_bins**F slabs; the flow-CRF uses F=2 (flow_x, flow_y).

    TPU shape: both the splat and the slice are contractions of Q against a
    per-4x4-block one-hot matrix — batched [S, 16] x [16, L] matmuls on the
    MXU at POOLED resolution. The earlier formulation materialised the
    [slabs*L, H, W] grid at full CRF resolution (22 MB) and pool/unpooled it
    with 68 MB reshapes; per mean-field iteration that was ~1.8 ms of pure
    data movement (measured), where the block-matmul form touches ~6 MB.
    The pooling (spatial sigma 40 px >> pool 4) and the nearest-neighbour
    slice are unchanged semantics — identical to pool-blur-unpool-select.
    """
    nl, h, w = q.shape
    f = features.shape[-1]
    nslab = grid_bins**f
    if plan is None:
        plan = bilateral_grid_splat_plan(features, grid_bins)
    oh_blocks, scale, ds = plan
    hp, wp = h // ds, w // ds
    npix_blk = ds * ds
    hi = jax.lax.Precision.HIGHEST

    # splat + pool in one batched matmul: [hp, wp, S, 16] @ [hp, wp, 16, L]
    q_blocks = (
        q.reshape(nl, hp, ds, wp, ds)
        .transpose(1, 3, 2, 4, 0)
        .reshape(hp, wp, npix_blk, nl)
    )
    grid = jnp.einsum("hwsp,hwpl->hwsl", oh_blocks, q_blocks, precision=hi)
    occ = jnp.sum(oh_blocks, axis=-1)  # [hp, wp, S]

    # spatial blur over the pooled grid, channels-last (S*L rides the lanes)
    sig = sigma_xy / ds
    grid = _blur_hw_leading(grid.reshape(hp, wp, nslab * nl), sig).reshape(
        hp, wp, nslab, nl
    )
    occ = _blur_hw_leading(occ, sig)

    # blur across the feature axes: ONE circulant contraction on the slab
    # axis. The separable per-axis 5-tap roll loops emitted ~20 small
    # [hp, wp, bins^F(, L)] ops per mean-field iteration; the same linear map
    # is kern = kron_f(circulant_f) applied as a single [S, S] matmul on the
    # MXU (S = bins^F = 64 here). Numerically identical including the rolls'
    # wrap-around (the circulant wraps the same way).
    import numpy as np

    sigma_bins = sigma_f * scale  # [F] in bin units (traced)
    offs = list(range(-2, 3))
    roll_mats = np.stack(
        [np.eye(grid_bins, dtype=np.float32)[:, np.roll(np.arange(grid_bins), -off)]
         for off in offs]
    )  # roll_mats[k][a, b] = 1 iff b == (a - off_k) mod bins
    roll_mats = jnp.asarray(roll_mats)
    hi2 = jax.lax.Precision.HIGHEST
    kern = None
    for i in range(f):
        sb = jnp.maximum(sigma_bins[i], 1e-3)
        wts = jnp.exp(-0.5 * (jnp.asarray(offs, q.dtype) / sb) ** 2)
        wts = wts / jnp.sum(wts)
        km = jnp.einsum("k,kab->ab", wts, roll_mats, precision=hi2)
        if kern is None:
            kern = km
        else:
            s0 = kern.shape[0]
            kern = jnp.einsum("ab,cd->acbd", kern, km, precision=hi2).reshape(
                s0 * grid_bins, s0 * grid_bins
            )
    grid = jnp.einsum("hwsl,st->hwtl", grid, kern, precision=hi2)
    occ = jnp.einsum("hws,st->hwt", occ, kern, precision=hi2)

    # slice at pooled resolution: each pixel reads its own slab of its own
    # block — the transpose of the splat matmul (nearest upsample + per-pixel
    # slab select, exactly as the unpool-einsum form)
    msg_blocks = jnp.einsum("hwsp,hwsl->hwpl", oh_blocks, grid, precision=hi)
    norm_blocks = jnp.einsum("hwsp,hws->hwp", oh_blocks, occ, precision=hi)
    msg = (
        msg_blocks.reshape(hp, wp, ds, ds, nl)
        .transpose(4, 0, 2, 1, 3)
        .reshape(nl, h, w)
    )
    norm = (
        norm_blocks.reshape(hp, wp, ds, ds)
        .transpose(0, 2, 1, 3)
        .reshape(h, w)
    )
    return msg / jnp.maximum(norm, 1e-6)[None]


def mean_field(
    unary: jnp.ndarray,  # [L, H, W] negative log-probabilities
    kernels: Sequence[Tuple[str, dict, float]],  # (type, params, weight)
    iterations: int,
) -> jnp.ndarray:
    """Potts-model mean-field (DenseCRF::inference). Returns Q [L, H, W]."""
    q = jax.nn.softmax(-unary, axis=0)
    # the bilateral splat assignment depends only on the (fixed) features —
    # build it once for all iterations
    kernels = [
        (
            kind,
            {**params, "plan": bilateral_grid_splat_plan(
                params["features"], params.get("grid_bins", 8)
            )} if kind == "bilateral" else params,
            weight,
        )
        for kind, params, weight in kernels
    ]

    def one_iteration(q, _):
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
        return jax.nn.softmax(-unary - pairwise, axis=0), None

    # scan instead of an unrolled Python loop: one traced iteration body
    # keeps the (already large) multi-model frame program compile-bounded
    q, _ = jax.lax.scan(one_iteration, q, None, length=iterations)
    return q
