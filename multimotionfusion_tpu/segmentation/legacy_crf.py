"""Legacy CoFusion CRF segmentation (ICP-error driven).

== reference Segmentation::performSegmentationCRF
(Core/Segmentation/Segmentation.cpp:159-740), the pre-flow-CRF mode kept for
parity (`-segm_mode crf`): SLIC superpixels -> per-superpixel unary energies
from each model's ICP error image (confidence-gated) + a new-model class ->
dense CRF over superpixels with a Gaussian smoothness kernel and a 6D
(x, y, r, g, b, depth) appearance kernel -> MAP -> largest component per
label -> new-label size gates -> upsample.

TPU advantage: the CRF runs over ~1200 superpixels, so the fully-connected
pairwise is an EXACT [S, S] kernel matmul per iteration — the reference needs
the permutohedral-lattice approximation even at superpixel count.

Default constants follow Segmentation.h:140-160.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.config import SegmentationConfig
from multimotionfusion_tpu.segmentation import components
from multimotionfusion_tpu.segmentation.slic import (
    SlicResult,
    downsample_to_superpixels,
    slic,
    upsample_from_superpixels,
)

MAX_DEPTH = 100.0
UNARY_THRESHOLD_NEW = 5.0
UNARY_K_ERROR = 0.01
UNARY_WEIGHT_ERROR = 40.0
SCALE_POS = 1.0 / 8.0
SCALE_RGB = 1.0 / 30.0
SCALE_DEPTH = 1.0 / 0.4
WEIGHT_SMOOTHNESS = 40.0
WEIGHT_APPEARANCE = 40.0


class LegacyCrfResult(NamedTuple):
    mask: jnp.ndarray  # [H, W] int32 model indices (labels < M)
    new_label_mask: jnp.ndarray  # [H, W] bool
    has_new_label: jnp.ndarray  # [] bool
    pixel_counts: jnp.ndarray  # [M] per model (largest component, superpixels)
    slic_labels: jnp.ndarray  # [H, W]


def _superpixel_crf(unary, feat_xyrgbd, q_iters):
    """Exact dense mean-field over superpixels.

    unary: [S, L] energies; feat: [S, 6] scaled features. Kernels: Gaussian
    over (x, y) with sigma 2 superpixels and Gaussian over all 6 features
    (DIAG kernel), both Potts (Segmentation.cpp:470-487).
    """
    xy = feat_xyrgbd[:, :2] * (SCALE_POS / (1.0 / 8.0)) / 2.0  # sigma 2 in sp units
    d_xy = jnp.sum((xy[:, None] - xy[None]) ** 2, axis=-1)
    k_smooth = jnp.exp(-0.5 * d_xy)
    d_f = jnp.sum((feat_xyrgbd[:, None] - feat_xyrgbd[None]) ** 2, axis=-1)
    k_app = jnp.exp(-0.5 * d_f)
    # exclude self-messages
    eye = jnp.eye(unary.shape[0])
    k_smooth = k_smooth - eye
    k_app = k_app - eye
    # symmetric normalisation (NORMALIZE_SYMMETRIC)
    def sym_norm(k):
        d = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(k, axis=1), 1e-12))
        return k * d[:, None] * d[None, :]

    k_smooth = sym_norm(k_smooth)
    k_app = sym_norm(k_app)

    q = jax.nn.softmax(-unary, axis=-1)
    for _ in range(q_iters):
        hi = jax.lax.Precision.HIGHEST
        msg = WEIGHT_SMOOTHNESS * jnp.matmul(
            k_smooth, q, precision=hi
        ) + WEIGHT_APPEARANCE * jnp.matmul(k_app, q, precision=hi)
        pairwise = jnp.sum(msg, axis=-1, keepdims=True) - msg  # Potts
        q = jax.nn.softmax(-unary - pairwise, axis=-1)
    return q


def legacy_crf_segmentation(
    rgb: jnp.ndarray,  # [H, W, 3]
    depth: jnp.ndarray,  # [H, W]
    icp_errors: jnp.ndarray,  # [M, H, W] per-model ICP error images
    model_conf: jnp.ndarray,  # [M, H, W] per-model prediction confidence
    model_active: jnp.ndarray,  # [M]
    cfg: SegmentationConfig,
    allow_new: bool = True,
    sp_size: int = 16,
) -> LegacyCrfResult:
    m = icp_errors.shape[0]
    n_labels = m + 1

    sp = slic(rgb, sp_size=sp_size, coh_weight=0.6, iterations=5)
    s = sp.mean_color.shape[0]

    low_depth = downsample_to_superpixels(depth, sp)
    depth_range = jnp.maximum(jnp.max(low_depth) - jnp.min(low_depth), 1e-3)
    low_icp = jax.vmap(lambda e: downsample_to_superpixels(e, sp))(icp_errors)
    low_conf = jax.vmap(lambda c: downsample_to_superpixels(c, sp))(model_conf)

    # confidence gates (Segmentation.cpp:268-281)
    low_icp = low_icp.at[0].set(
        jnp.where(low_conf[0] < 0.3, depth_range * 0.01, low_icp[0])
    )
    if m > 1:
        gated = jnp.where(
            low_conf[1:] <= 0.4, depth_range * UNARY_K_ERROR, low_icp[1:]
        )
        low_icp = low_icp.at[1:].set(gated)

    err = low_icp / depth_range  # [M, S]
    err = jnp.where(model_active[:, None], err, jnp.inf)
    unary_models = UNARY_WEIGHT_ERROR * err
    lowest = jnp.min(jnp.where(model_active[:, None], err, jnp.inf), axis=0)
    unary_new = jnp.maximum(
        UNARY_THRESHOLD_NEW - UNARY_WEIGHT_ERROR * lowest, 0.01
    )
    if not allow_new:
        unary_new = jnp.full_like(unary_new, jnp.inf)
    unary = jnp.concatenate([unary_models, unary_new[None]], axis=0).T  # [S, L]
    unary = jnp.minimum(jnp.nan_to_num(unary, posinf=1e5), 1e5)
    unary = jnp.maximum(unary, 1e-5)  # (Segmentation.cpp:495-497)

    feat = jnp.concatenate(
        [
            sp.mean_xy * SCALE_POS,
            sp.mean_color * SCALE_RGB,
            jnp.minimum(low_depth * SCALE_DEPTH, 100.0)[:, None],
        ],
        axis=-1,
    )
    q = _superpixel_crf(unary, feat, cfg.crf_iterations)
    lbl_sp = jnp.argmax(q, axis=-1)  # [S]

    lbl = upsample_from_superpixels(lbl_sp, sp)  # [H, W] at full res

    h, w = depth.shape
    segm = jnp.full((h, w), -1, jnp.int32)
    counts = []
    for l in range(n_labels):
        largest = components.keep_largest_component(lbl == l)
        segm = jnp.where(largest, l, segm)
        counts.append(jnp.sum(largest.astype(jnp.int32)))
    counts = jnp.stack(counts)

    # new-label size gates relative to the superpixel grid (in full-res px)
    total = h * w
    new_px = counts[m]
    has_new = (
        jnp.asarray(allow_new)
        & (new_px > cfg.min_rel_size_new * total)
        & (new_px < cfg.max_rel_size_new * total)
    )
    new_mask = (segm == m) & has_new
    mask = jnp.where((segm < 0) | (segm == m), 0, segm)
    return LegacyCrfResult(
        mask=mask,
        new_label_mask=new_mask,
        has_new_label=has_new,
        pixel_counts=counts[:m],
        slic_labels=sp.labels,
    )
