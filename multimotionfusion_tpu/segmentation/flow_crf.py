"""Flow-CRF motion segmentation (the MultiMotionFusion paper contribution).

TPU re-design of reference Segmentation::performSegmentationFlowCRF
(Core/Segmentation/Segmentation.cpp:742-1347). Per frame, at 1/4 scale:

1. dense optical flow prev->next (:779-817; LK substitute, see flow.py);
2. dense reprojection probability per model from |frame depth - predicted
   model depth|, truncated at 0.03 m, exp(-d/0.03), normalised (:819-862);
3. sparse unaries from per-track velocity errors of model-local track
   projections, binarised at the threshold, with an outlier class =
   "fits no active model" (:942-1102, norm01 branch);
4. softmax -> -log -> dense CRF with a Gaussian smoothness kernel and a
   (x, y, flow) Potts kernel (:1117-1147; bilateral grid substitute for the
   permutohedral lattice, see crf.py);
5. fuse the CRF posterior (scaled by a 0.2..5 px flow-magnitude ramp) with
   the reprojection probability: 1 - (1-p_flow)(1-p_proj) (:1174-1198);
6. MAP -> largest connected component per model -> full-res mask; a new
   label exists iff the outlier segment covers > 5% of the image (:1246-1324).

All label slots are fixed size (MAX_LABELS = max models + outlier class) with
an active-models mask, so the whole pass is one jittable program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.config import CameraModel, SegmentationConfig
from multimotionfusion_tpu.ops import image as imops
from multimotionfusion_tpu.segmentation import components, crf
from multimotionfusion_tpu.segmentation.flow import dense_flow


class SegmentationResult(NamedTuple):
    mask: jnp.ndarray  # [H, W] int32 model-slot ids at FULL resolution
    new_label_mask: jnp.ndarray  # [H, W] bool — pixels of the prospective new model
    has_new_label: jnp.ndarray  # [] bool (> 5% of the image is outlier)
    pixel_counts: jnp.ndarray  # [M] int32 per model slot (largest component, full res)
    depth_mean: jnp.ndarray  # [M+1] mean frame depth inside each mask
    # (index M = the prospective new label's segment). Mean/std feed each
    # object model's per-frame max-depth clamp, maxDepth = mean + 1.2 std
    # (reference MultiMotionFusion.cpp:408,486,563) — the guard that keeps
    # background beyond the object's depth band out of its map.
    depth_std: jnp.ndarray  # [M+1]
    flow: jnp.ndarray  # [Hc, Wc, 2] the computed flow (debug/GUI parity)


def reprojection_probability(
    frame_depth_c: jnp.ndarray,  # [Hc, Wc] frame depth at CRF scale
    pred_depth_c: jnp.ndarray,  # [M, Hc, Wc] per-model predicted depth
    model_active: jnp.ndarray,  # [M] bool
    max_err: float = 0.03,
):
    """Per-model normalised reprojection probability + outlier probability.

    Model rows are the RAW fit quality exp(-truncated |depth error|/max_err);
    the outlier row is 1 - max_m of that. Deviations from the reference
    (Segmentation.cpp:819-862, 1149-1153), both deliberate: the reference
    normalises model rows over active models — with a single active model
    that is identically 1, and its outlier row reads UNINITIALISED memory, so
    nothing could ever out-score model 0 in the posterior fusion and the
    first object could never spawn through this term. Raw fit quality keeps
    the rows comparable across any number of models and makes the outlier row
    exactly "no model explains the observed depth".
    """
    dist = jnp.abs(frame_depth_c[None] - pred_depth_c)
    invalid = jnp.any(
        (frame_depth_c[None] < 1e-6) & (pred_depth_c < 1e-6), axis=0
    )
    # NO truncation (the reference truncates at max_err before exp,
    # Segmentation.cpp:843): with raw rows the exp(-1) floor would keep a
    # grossly wrong model competitive against the outlier class; untruncated,
    # a metre-scale misfit scores ~0 as it should
    raw = jnp.exp(-dist / max_err)
    # a model without prediction coverage at a pixel cannot claim it
    raw = jnp.where(pred_depth_c > 1e-6, raw, 0.0)
    prob = jnp.where(invalid[None], 0.0, raw * model_active[:, None, None])
    best_fit = jnp.max(prob, axis=0)
    # the outlier (new-object) row additionally requires the observation to be
    # IN FRONT of every covering model's surface: an unexplained pixel that is
    # FARTHER than a prediction is an occlusion reveal — stale map geometry
    # uncovered by motion — which fusion's see-through cull owns, not a new
    # object (a real object occludes; it cannot be behind known free space).
    # The reference never faces this: its row normalisation makes the term
    # vacuous with one active model, so reveals only reach its CRF through the
    # (motion-gated) flow term. With raw rows the gate is load-bearing.
    covered = (pred_depth_c > 1e-6) & model_active[:, None, None]
    behind = covered & (
        frame_depth_c[None] > pred_depth_c + max_err
    )
    in_front = ~jnp.any(behind, axis=0)
    # ... and NEVER-OBSERVED pixels are neutral, not outliers: a region the
    # mover just uncovered was occluded at every past frame, so no model
    # covers it — it is new GLOBAL geometry, not a new object (the reference
    # reaches the same outcome via its "equal probability for uncertain
    # data" expsum==0 branch, Segmentation.cpp:858-861: unknowns never feed
    # its outlier class either).
    any_cover = jnp.any(covered, axis=0)
    outlier = jnp.where(
        invalid | ~in_front | ~any_cover, 0.0, 1.0 - best_fit
    )
    # valid frame depth required: unobserved pixels can't vote for a new model
    outlier = jnp.where(frame_depth_c > 1e-6, outlier, 0.0)
    return prob, outlier, behind


def sparse_unary(
    track_xy: jnp.ndarray,  # [T, 2] latest keypoint pixel coords (full res)
    track_vel: jnp.ndarray,  # [M, T] velocity error per model (px/s)
    track_valid: jnp.ndarray,  # [T] bool (pair available, finite depth both ends)
    model_active: jnp.ndarray,  # [M] bool
    hc: int,
    wc: int,
    scale: float,
    threshold: float,
    allow_new: bool,
) -> jnp.ndarray:
    """[L, Hc, Wc] unary ERRORS: 0 match / 1 mismatch / +inf unknown
    (Segmentation.cpp:942-1102, norm01 branch). L = M + 1 (outlier last)."""
    m = track_vel.shape[0]
    inf = jnp.float32(jnp.inf)
    err_active = jnp.where(
        track_valid[None] & model_active[:, None],
        (track_vel > threshold).astype(jnp.float32),
        inf,
    )  # [M, T]
    # outlier class: error 1 iff the track fits ANY active model
    fits_any = jnp.any(
        (track_vel < threshold) & model_active[:, None], axis=0
    )
    err_outlier = jnp.where(
        track_valid & jnp.all(~model_active[:, None] | jnp.isfinite(track_vel), axis=0),
        fits_any.astype(jnp.float32),
        inf,
    )
    if allow_new:
        err = jnp.concatenate([err_active, err_outlier[None]], axis=0)  # [L, T]
    else:
        err = jnp.concatenate(
            [err_active, jnp.full((1, err_active.shape[1]), inf)], axis=0
        )

    # scatter per-track errors to CRF pixels (min where several tracks land)
    xi = jnp.clip(jnp.rint(track_xy[:, 0] * scale).astype(jnp.int32), 0, wc - 1)
    yi = jnp.clip(jnp.rint(track_xy[:, 1] * scale).astype(jnp.int32), 0, hc - 1)
    pix = jnp.where(track_valid, yi * wc + xi, hc * wc)
    unary = jnp.full((err.shape[0], hc * wc + 1), inf)
    unary = unary.at[:, pix].min(err, mode="drop")
    return unary[:, : hc * wc].reshape(-1, hc, wc)


def flow_crf_segmentation(
    prev_intensity: jnp.ndarray,  # [H, W] previous frame intensity
    next_intensity: jnp.ndarray,  # [H, W]
    frame_depth: jnp.ndarray,  # [H, W]
    pred_depth: jnp.ndarray,  # [M, H, W] per-model predicted depth (full res)
    model_active: jnp.ndarray,  # [M] bool
    track_xy: jnp.ndarray,  # [T, 2]
    track_vel: jnp.ndarray,  # [M, T] px/s velocity error per model
    track_valid: jnp.ndarray,  # [T]
    cam: CameraModel,
    cfg: SegmentationConfig,
    allow_new: bool = True,
    pred_at_crf_scale: bool = False,
) -> SegmentationResult:
    h, w = frame_depth.shape
    hc, wc = int(h * cfg.scale), int(w * cfg.scale)
    m = pred_depth.shape[0]
    n_labels = m + 1

    # 1. optical flow at CRF scale
    prev_c = imops.resize_bilinear(prev_intensity, (hc, wc))
    next_c = imops.resize_bilinear(next_intensity, (hc, wc))
    flow = dense_flow(prev_c, next_c)

    # 2. dense reprojection probability. pred_at_crf_scale: the composite
    # engine renders per-model depth directly at CRF scale
    # (rasterize.render_model_depths) — no full-res images to downsample.
    # DEPTH is downsampled by NEAREST (centre sample), never bilinear:
    # averaging across an object/background discontinuity manufactures
    # intermediate depths (e.g. 1.9 m from a 1.3 m sphere against a 2.5 m
    # wall) that match NO model's prediction, firing a phantom OUTLIER ring
    # around every object — measured as 2-3-cell rings that the CRF then
    # assembles into phantom "new object" segments. Bilinear also smears
    # invalid (0) depths into partial values at hole borders.
    if h == hc * (h // hc) and w == wc * (w // wc):
        ky, kx = h // hc, w // wc
        frame_depth_c = frame_depth.reshape(hc, ky, wc, kx)[
            :, ky // 2, :, kx // 2
        ]
    else:
        frame_depth_c = imops.resize_bilinear(frame_depth, (hc, wc))
    if pred_at_crf_scale:
        pred_depth_c = pred_depth
    else:
        pred_depth_c = jax.vmap(
            lambda d: imops.resize_bilinear(d, (hc, wc))
        )(pred_depth)
    p_proj_m, p_proj_out, behind = reprojection_probability(
        frame_depth_c, pred_depth_c, model_active, cfg.sigma_depth
    )
    p_proj = jnp.concatenate([p_proj_m, p_proj_out[None]], axis=0)

    # 3. sparse unaries -> 4. CRF
    unary_err = sparse_unary(
        track_xy, track_vel, track_valid, model_active, hc, wc,
        cfg.scale, cfg.velocity_threshold, allow_new,
    )  # [L, Hc, Wc] errors
    # softmax over -errors; all-inf columns get uniform (Segmentation.cpp:1117-1127)
    e = jnp.exp(-unary_err)
    esum = jnp.sum(e, axis=0)
    probs = jnp.where(esum[None] > 0, e / jnp.maximum(esum[None], 1e-12), 1.0 / n_labels)
    unary = -jnp.log(jnp.maximum(probs, 1e-12))  # [L, Hc, Wc]

    q = crf.mean_field(
        unary,
        kernels=[
            ("gaussian", dict(sigma=cfg.pairwise_gaussian_sigma),
             4.0 * cfg.pairwise_gaussian_weight),
            ("bilateral",
             dict(features=flow * 10.0, sigma_xy=cfg.pairwise_flow_sigma_xy,
                  sigma_f=10.0 * cfg.pairwise_flow_sigma_v),
             cfg.pairwise_flow_weight),
        ],
        iterations=cfg.crf_iterations,
    )  # [L, Hc, Wc] — channel-first throughout (lane-utilisation; see crf.py)

    # 5. fuse with flow-magnitude ramp + reprojection probability
    magn = jnp.linalg.norm(flow, axis=-1)
    ramp = jnp.clip((magn - cfg.flow_ramp_lo) / (cfg.flow_ramp_hi - cfg.flow_ramp_lo),
                    0.0, 1.0)
    p_flow = q * ramp[None]
    p_proj_g = jnp.where(p_proj < 0.3, 0.0, p_proj)
    prob = 1.0 - (1.0 - p_flow) * (1.0 - p_proj_g)
    # visibility constraint on OBJECT rows: a pixel observed BEHIND model m's
    # predicted surface is free space m has moved away from (an occlusion
    # reveal) — m cannot claim it, however hard the CRF's smoothness floods
    # m's label over the trailing edge (reveal pixels have flow and no
    # tracks, so the flow ramp is open and the unary is uniform — without
    # this gate the flooded claim wins, the object's adaptive max-depth band
    # (mean + 1.2 std, MultiMotionFusion.cpp:408) stretches over the
    # background, and fusion feeds background surfels into the object's map
    # from which it then claims background FOREVER). The GLOBAL row is NOT
    # gated: behind-global pixels are stale map geometry that fusion's
    # see-through cull owns (clean pass), exactly like the outlier row's
    # in_front gate above.
    obj_behind = jnp.concatenate(
        [jnp.zeros_like(behind[:1]), behind[1:],
         jnp.zeros_like(behind[:1])], axis=0,
    )
    prob = jnp.where(obj_behind, 0.0, prob)
    # inactive model slots can never win
    label_ok = jnp.concatenate([model_active, jnp.array([allow_new])])
    prob = jnp.where(label_ok[:, None, None], prob, -1.0)
    # near-ties between MODEL rows break to the LOWER model id: the
    # reference's row normalisation makes two models that explain a pixel
    # equally well tie EXACTLY and its MAP takes the first row (global before
    # objects); raw fit rows instead differ by mm-level depth noise, which
    # would randomly split ownership of doubly-explained pixels and let an
    # object model cling to background patches inside its depth band forever.
    # The outlier row is NOT biased: its probability saturates at exactly 1.0
    # on a gross misfit, and penalising it lets a CRF-flooded model row
    # (smoothness spreading over trackless new-object pixels) steal half of a
    # genuinely unexplained segment.
    bias = 0.02 * jnp.concatenate(
        [jnp.arange(m, dtype=jnp.float32), jnp.zeros((1,), jnp.float32)]
    )
    lbl = jnp.argmax(prob - bias[:, None, None], axis=0)  # [Hc, Wc]
    # minimum-claim-confidence floor (config.min_claim_prob): a pixel whose
    # best non-global explanation stays weak is NOT handed to that model —
    # it defaults to global, whose fusion/cull owns ambiguous geometry
    best = jnp.max(prob, axis=0)
    lbl = jnp.where((lbl > 0) & (best < cfg.min_claim_prob), 0, lbl)

    # 6. largest component per label, counts, new-label gate — OBJECT labels
    # and the new-label class in ONE batched sweep scan. The GLOBAL label is
    # deliberately excluded: its component is image-sized (geodesic diameter
    # ~hc+wc, far beyond any affordable sweep budget — 64 sweeps left it
    # fragmented and reported a ~2k-cell "largest component" for a ~17k-cell
    # background), and pruning its satellites is a NO-OP anyway: unlabelled
    # pixels default to the global model in the final mask. Skipping it
    # fixes the global pixel-count / depth statistics and sheds 1/L of the
    # sweep + size-scatter work.
    label_stack = jnp.stack([lbl == l for l in range(1, n_labels)])
    largest_obj = components.keep_largest_components_batched(label_stack)
    counts = jnp.concatenate(
        [
            jnp.sum((lbl == 0).astype(jnp.int32))[None],
            jnp.sum(
                largest_obj.reshape(n_labels - 1, -1).astype(jnp.int32),
                axis=1,
            ),
        ]
    )
    # minimum segment size for OBJECT labels (min_mask_size_px at full res,
    # scaled to CRF cells): a model whose surviving component shrinks below
    # it loses the pixels to the global model, so a dying claim reaches
    # count 0 and the engine's unseen counter can actually fire
    # (MultiMotionFusion.cpp:606-613 tests exact zero). Global (l=0) and
    # the new-label class (own min_frac gate) are exempt.
    min_cells = max(1, int(round(cfg.min_mask_size_px * cfg.scale * cfg.scale)))
    obj_ok = counts >= min_cells
    for l in range(1, m):
        largest_obj = largest_obj.at[l - 1].set(largest_obj[l - 1] & obj_ok[l])
    counts = counts * jnp.concatenate(
        [jnp.ones((1,), jnp.int32), obj_ok[1:m].astype(jnp.int32),
         jnp.ones((1,), jnp.int32)]
    )
    segm = jnp.where(lbl == 0, jnp.int32(0), jnp.int32(-1))
    for l in range(1, n_labels):
        segm = jnp.where(largest_obj[l - 1], l, segm)

    # border rejection (Segmentation.cpp:583-590, borderSize=20 full-res px):
    # a candidate segment whose bounding box lies entirely inside one border
    # band is an image-edge artefact (flow and splat coverage are both
    # unreliable there), not an entering object
    new_comp = largest_obj[m - 1]
    yy = jnp.arange(hc, dtype=jnp.int32)[:, None]
    xx = jnp.arange(wc, dtype=jnp.int32)[None, :]
    top = jnp.min(jnp.where(new_comp, yy, hc))
    bottom = jnp.max(jnp.where(new_comp, yy, -1))
    left = jnp.min(jnp.where(new_comp, xx, wc))
    right = jnp.max(jnp.where(new_comp, xx, -1))
    b = max(1, int(round(20 * cfg.scale)))
    at_border = (
        ((top < b) & (bottom < b))
        | ((left < b) & (right < b))
        | ((top > hc - 1 - b) & (bottom > hc - 1 - b))
        | ((left > wc - 1 - b) & (right > wc - 1 - b))
    )

    has_new = (
        jnp.asarray(allow_new)
        & ((counts[m].astype(jnp.float32) / (hc * wc)) > cfg.new_label_min_frac)
        & ~at_border
    )

    # upsample (nearest) to full resolution; unlabelled pixels -> model 0.
    # Integer-factor case: broadcast+reshape (pure data movement) — the
    # equivalent fancy-index gather costs ~30x more on TPU (3.2 ms vs 0.1 ms
    # at this shape, tools/microbench_scatter2.py).
    if h == hc * (h // hc) and w == wc * (w // wc) and h // hc == w // wc:
        k = h // hc
        full = jnp.broadcast_to(
            segm[:, None, :, None], (hc, k, wc, k)
        ).reshape(h, w)
    else:
        ys = jnp.clip((jnp.arange(h) * cfg.scale).astype(jnp.int32), 0, hc - 1)
        xs = jnp.clip((jnp.arange(w) * cfg.scale).astype(jnp.int32), 0, wc - 1)
        full = segm[ys[:, None], xs[None, :]]
    new_mask = full == m
    mask = jnp.where((full < 0) | (full == m), 0, full)

    scale_w = 1.0 / (cfg.scale * cfg.scale)
    pix_counts = (counts[:m].astype(jnp.float32) * scale_w).astype(jnp.int32)
    # per-segment depth statistics, SIGMA-CLIPPED (two passes): the CRF's
    # smoothness corona rounds every segment outward by ~1-2 CRF cells, so a
    # small object's segment is bimodal — object surface plus a background
    # ring that can be >30% of the area. One-pass mean+1.2std over that
    # mixture (the reference formula, MultiMotionFusion.cpp:408) yields a
    # band that REACHES THE BACKGROUND, and everything downstream that
    # trusts the band (spawn backprojection, per-frame fusion max-depth)
    # then pulls background geometry into the object's map — the phantom-
    # model failure (a vanished mover's slot claiming backdrop forever).
    # The second pass recomputes over pixels within the first band, which
    # collapses onto the dominant (object) mode. Computed at CRF scale: the
    # mask IS CRF-scale information (nearest-upsampled), so full-res passes
    # only cost more.
    depth_ok = frame_depth_c > 1e-6
    lbl_stack = jnp.stack(
        [(segm == l) & depth_ok for l in range(m + 1)]
    )  # [L, Hc, Wc]; index m = the new-label segment

    def _stats(sel):
        cnt = jnp.sum(sel, axis=(1, 2))
        n = jnp.maximum(cnt, 1.0)
        mu = jnp.sum(jnp.where(sel, frame_depth_c[None], 0.0), axis=(1, 2)) / n
        var = (
            jnp.sum(jnp.where(sel, frame_depth_c[None] ** 2, 0.0), axis=(1, 2))
            / n
            - mu**2
        )
        return mu, jnp.sqrt(jnp.maximum(var, 0.0)), cnt

    sel0 = lbl_stack.astype(jnp.float32)
    mu0, sd0, _ = _stats(sel0)
    band = jnp.maximum(1.2 * sd0, 0.05)  # >= 5 cm so a flat segment keeps itself
    lo = (mu0 - band)[:, None, None]
    hi = (mu0 + band)[:, None, None]
    sel1 = sel0 * (
        (frame_depth_c[None] >= lo) & (frame_depth_c[None] <= hi)
    ).astype(jnp.float32)
    depth_mean, depth_std, _ = _stats(sel1)

    return SegmentationResult(
        mask=mask,
        new_label_mask=new_mask,
        has_new_label=has_new,
        pixel_counts=pix_counts,
        depth_mean=depth_mean,
        depth_std=depth_std,
        flow=flow,
    )
