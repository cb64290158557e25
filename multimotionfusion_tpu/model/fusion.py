"""Surfel fusion and map maintenance.

TPU re-design of the reference's two transform-feedback fusion passes and the
clean pass (reference Core/Model/Model.cpp:893-1182 driving
Core/Shaders/data.vert/.geom/.frag, update.vert, copy_unstable.vert/.geom):

- ``fuse``: per-pixel data association against the index map (data.vert window
  search with the zdiff*lambda and ray-distance gates), then a weighted
  attribute merge into the winning surfel (update.vert) and an append of
  unmatched pixels as new unstable surfels. The GL framebuffer's last-write-
  wins conflict resolution between pixels that picked the same surfel becomes
  a deterministic min-pixel-id scatter.

- ``clean``: per-surfel redundancy counts + see-through outlier test +
  unstable-age cull (copy_unstable.vert), followed by prefix-sum compaction
  (the GL geometry-shader discard).

Everything is a pure jittable function of (SurfelMap, frame arrays) -> SurfelMap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.config import CameraModel, SurfelConfig
from multimotionfusion_tpu.model import surfel_map as sm
from multimotionfusion_tpu.ops.rasterize import INVALID, IndexMap, gather_attr_images

_BIG = jnp.float32(3.4e38)
_IMAX = jnp.int32(2**31 - 1)


def _shift_with_invalid(img: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """img[y+dy, x+dx] with out-of-bounds -> fill."""
    h, w = img.shape
    out = jnp.roll(img, (-dy, -dx), axis=(0, 1))
    if dy > 0:
        out = out.at[h - dy :, :].set(fill)
    elif dy < 0:
        out = out.at[: -dy, :].set(fill)
    if dx > 0:
        out = out.at[:, w - dx :].set(fill)
    elif dx < 0:
        out = out.at[:, : -dx].set(fill)
    return out


def _window_offsets(window: int):
    r = window // 2
    return [(dy, dx) for dy in range(-r, window - r) for dx in range(-r, window - r)]


def fuse(
    smap: sm.SurfelMap,
    frame: sm.FrameSurfels,  # camera-frame candidates (data already gated by .valid)
    index_map: IndexMap,  # from predict_indices at the model pose
    mask: jnp.ndarray,  # [H, W] int32 model-id mask
    mask_id,
    pose: jnp.ndarray,  # [4,4] model pose (camera -> global)
    cam: CameraModel,
    time,
    cfg: SurfelConfig,
    attrs: jnp.ndarray | None = None,  # gather_attr_images(index_map) if cached
) -> sm.SurfelMap:
    """One fusion step: associate -> merge -> append new unstable surfels."""
    h, w = cam.height, cam.width
    n_pix = h * w

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    xl = (xs - cam.cx) / cam.fx
    yl = (ys - cam.cy) / cam.fy
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)

    fz = frame.data[sm.PZ].reshape(h, w)
    fnx = frame.data[sm.NX].reshape(h, w)
    fny = frame.data[sm.NY].reshape(h, w)
    fnz = frame.data[sm.NZ].reshape(h, w)

    # participation gates (data.vert:115-121): checkerboard subsample in time,
    # mask agreement, 4-neighbour depth support, valid depth
    ti = jnp.int32(time)
    xi = jnp.arange(w, dtype=jnp.int32)[None, :]
    yi = jnp.arange(h, dtype=jnp.int32)[:, None]
    checker = ((xi % 2) == (ti % 2)) & ((yi % 2) == (ti % 2))
    neigh_ok = (
        (_shift_with_invalid(fz, 0, -1, 0.0) > 0)
        & (_shift_with_invalid(fz, 0, 1, 0.0) > 0)
        & (_shift_with_invalid(fz, -1, 0, 0.0) > 0)
        & (_shift_with_invalid(fz, 1, 0, 0.0) > 0)
    )
    participate = (
        checker
        & (mask == mask_id)
        & neigh_ok
        & frame.valid.reshape(h, w)
        & (fz > 0)
        & (fz <= cfg.depth_cutoff)
    )

    # --- window search over the index map (data.vert:127-163) -------------
    # all taps are stencil rolls of per-pixel winner-attribute images: the
    # whole search fuses into one image-shaped loop, no per-surfel gathers
    if attrs is None:
        attrs = gather_attr_images(index_map.data_local, index_map.index)

    best_dist = jnp.full((h, w), jnp.float32(1000.0))
    best_tgt = jnp.full((h, w), INVALID)
    for dy, dx in _window_offsets(cfg.assoc_window):
        cand = _shift_with_invalid(index_map.index, dy, dx, INVALID)
        cvalid = cand >= 0
        cdat = jnp.roll(attrs, (-dy, -dx), axis=(1, 2))
        cpx, cpy, cpz = cdat[sm.PX], cdat[sm.PY], cdat[sm.PZ]
        zdiff = cpz - fz
        z_ok = jnp.abs(zdiff * lam) < cfg.assoc_depth_gate
        # dist = |cross(ray, cand_pos)|, ray = (xl, yl, 1)
        rx = yl * cpz - cpy
        ry = cpx - xl * cpz
        rz = xl * cpy - yl * cpx
        dist = jnp.sqrt(rx * rx + ry * ry + rz * rz)
        cnx, cny, cnz = cdat[sm.NX], cdat[sm.NY], cdat[sm.NZ]
        # normal conformance: |n_z| < 0.75 or angle(n_cand, n_frame) < 0.5 rad
        cosang = jnp.clip(cnx * fnx + cny * fny + cnz * fnz, -1.0, 1.0)
        n_ok = (jnp.abs(cnz) < 0.75) | (jnp.abs(jnp.arccos(cosang)) < 0.5)
        better = cvalid & z_ok & n_ok & (dist < best_dist)
        best_dist = jnp.where(better, dist, best_dist)
        best_tgt = jnp.where(better, cand, best_tgt)

    # every participating pixel lies on the time-parity checkerboard
    # (x%2 == y%2 == time%2), so all scatter work below runs on the exact
    # [H/2, W/2] subgrid: 4x fewer scatter indices than full-res. Extraction
    # of img[par::2, par::2] is done for ALL images in ONE pass as (a) a
    # dynamic row slice + sublane stride (cheap) and (b) a one-hot selection
    # matmul for the lane (column) stride — a stride-2 lane slice is a
    # cross-lane relayout that costs ~0.8 ms PER IMAGE on TPU, while the MXU
    # selection of the whole 18-channel stack costs ~0.1 ms. All values ride
    # f32 lanes (ids < 2^24 are exact).
    par = ti % 2
    hc, wc = h // 2, w // 2
    n_cb = hc * wc

    stack = jnp.concatenate(
        [
            (participate & (best_tgt >= 0)).astype(jnp.float32)[None],
            best_tgt.astype(jnp.float32)[None],
            participate.astype(jnp.float32)[None],
            frame.data.reshape(sm.CHANNELS, h, w),
        ],
        axis=0,
    )
    rows = jax.lax.dynamic_slice(
        stack, (jnp.int32(0), par, jnp.int32(0)), (stack.shape[0], h - 1, w)
    )[:, ::2, :]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (w, wc), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (w, wc), 1) * 2 + par
    ).astype(jnp.float32)
    # barrier: hides the one-hot structure of sel, otherwise XLA rewrites the
    # selection dot into one gather PER CHANNEL (~0.8 ms each at 76800
    # indices) — the exact lowering this MXU construction exists to avoid
    sel = jax.lax.optimization_barrier(sel)
    # Precision.HIGHEST is LOAD-BEARING: the default TPU matmul precision is
    # bf16, which has only ~2.3k distinct representable values below 2^17 —
    # the extracted surfel ids would collapse onto those values, silently
    # misdirecting ~97% of merges (and corrupting extracted positions/depths).
    cb_all = jax.lax.dot_general(
        rows.reshape(-1, w), sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(stack.shape[0], hc, wc)

    merging = (cb_all[0] > 0.5).reshape(n_cb)
    target_img = cb_all[1].astype(jnp.int32)
    target = target_img.reshape(n_cb)

    # --- merge (update.vert:57-97) ----------------------------------------
    # old attrs come from the winning tap's attr image (gathered per pixel by
    # the target id), transformed to the global frame per pixel — not from a
    # per-surfel gather over the whole map
    new_global = sm.transform_surfels(
        cb_all[3:].reshape(sm.CHANNELS, n_cb), pose
    )
    old_local = gather_attr_images(
        index_map.data_local, target_img
    ).reshape(sm.CHANNELS, n_cb)
    old = sm.transform_surfels(old_local, pose)  # local -> global per pixel

    c_k = old[sm.CONF]
    a = new_global[sm.CONF]
    csum = jnp.maximum(c_k + a, 1e-12)
    rad_ok = new_global[sm.RADIUS] < 1.5 * old[sm.RADIUS]

    def wavg(ch):
        return (c_k * old[ch] + a * new_global[ch]) / csum

    merged = old
    for ch in (sm.PX, sm.PY, sm.PZ, sm.CR, sm.CG, sm.CB):
        merged = merged.at[ch].set(jnp.where(rad_ok, wavg(ch), old[ch]))
    nmx, nmy, nmz = wavg(sm.NX), wavg(sm.NY), wavg(sm.NZ)
    nn = jnp.sqrt(jnp.maximum(nmx * nmx + nmy * nmy + nmz * nmz, 1e-12))
    merged = merged.at[sm.NX].set(jnp.where(rad_ok, nmx / nn, old[sm.NX]))
    merged = merged.at[sm.NY].set(jnp.where(rad_ok, nmy / nn, old[sm.NY]))
    merged = merged.at[sm.NZ].set(jnp.where(rad_ok, nmz / nn, old[sm.NZ]))
    merged = merged.at[sm.RADIUS].set(
        jnp.where(rad_ok, wavg(sm.RADIUS), old[sm.RADIUS])
    )
    merged = merged.at[sm.CONF].set(c_k + a)
    merged = merged.at[sm.LAST_T].set(jnp.float32(time))

    # --- merge + append, applied INVERSELY (scatter-min + gather) ----------
    # merge writes go to winning surfel ids (< count); new unstable surfels
    # (data.vert updateId=2 -> newUnstableBuffer) go to fresh slots after the
    # high-water mark. A direct 16-channel scatter lowers to a SERIAL
    # per-index loop on TPU (~44 ns/index, ~7 ms at 2*n_cb=153k indices —
    # measured via the XLA trace); instead, ONE 1-channel scatter-min builds
    # the inverse map slot -> source column (which simultaneously arbitrates
    # GL's last-write-wins between pixels that picked the same surfel, as
    # deterministic min-pixel-id), and the update itself is a vectorised
    # [16, bucket] gather + select (~3x cheaper end to end).
    cap = smap.capacity
    merge_dst = jnp.where(merging, target, cap)
    new_mask = (cb_all[2] > 0.5).reshape(n_cb) & ~merging
    new_i = new_mask.astype(jnp.int32)
    append_dst = smap.count + jnp.cumsum(new_i) - 1
    append_dst = jnp.where(new_mask & (append_dst < cap), append_dst, cap)
    dst = jnp.concatenate([merge_dst, append_dst])
    vals = jnp.concatenate([merged, new_global], axis=1)  # [16, 2*n_cb]
    n_src = 2 * n_cb
    src_ids = jnp.arange(n_src, dtype=jnp.int32)
    inv = jnp.full((cap,), n_src, jnp.int32).at[dst].min(src_ids, mode="drop")
    updated = inv < n_src
    upd = vals[:, jnp.minimum(inv, n_src - 1)]
    data = jnp.where(updated[None], upd, smap.data)
    n_new = jnp.minimum(jnp.sum(new_i), cap - smap.count)
    return sm.SurfelMap(data=data, count=smap.count + n_new)


def clean(
    smap: sm.SurfelMap,
    index_map: IndexMap,  # fresh predict_indices AFTER fuse (Model.cpp:791-817)
    depth_input: jnp.ndarray,  # [H, W] filtered frame depth (m)
    mask: jnp.ndarray,  # [H, W] int32
    mask_id,
    pose: jnp.ndarray,
    cam: CameraModel,
    time,
    time_delta,
    conf_threshold,
    cfg: SurfelConfig,
    attrs: jnp.ndarray | None = None,  # gather_attr_images(index_map) if cached
    compact: bool | jnp.ndarray = False,  # static, or traced periodic predicate
) -> sm.SurfelMap:
    """Outlier cull + redundancy cull + compaction (copy_unstable.vert).

    TPU restructure: the reference evaluates the window/see-through tests for
    EVERY surfel at its projected pixel (a per-surfel gather storm). Here the
    tests run in IMAGE space for each pixel's index-map winner (stencil rolls
    over attribute images), and results scatter back to the winning surfel
    ids. Surfels not visible in the index map this frame skip the visual
    tests — they are exactly the surfels those tests cannot fire for anyway
    (the redundancy/z-counts require the query to be in front of the mapped
    surface, i.e. the pixel winner; see-through penalties likewise target the
    front-most surfel) — and still receive the attribute-only culls.

    Deformation-graph application (nodeSampler path, copy_unstable.vert:140+)
    is layered separately: apply the graph to smap.data before calling clean.
    """
    h, w = cam.height, cam.width
    cap = smap.capacity
    last_t = smap.data[sm.LAST_T]

    idx_img = index_map.index  # [H, W]
    if attrs is None:
        attrs = gather_attr_images(index_map.data_local, idx_img)  # [C, H, W]
    qx, qy, qz = attrs[sm.PX], attrs[sm.PY], attrs[sm.PZ]
    q_init = attrs[sm.INIT_T]
    q_rad = attrs[sm.RADIUS]
    q_nz = jnp.abs(attrs[sm.NZ])
    has_winner = idx_img >= 0

    count = jnp.zeros((h, w), jnp.int32)
    z_count = jnp.zeros((h, w), jnp.int32)
    for dy, dx in _window_offsets(cfg.assoc_window):
        cand = _shift_with_invalid(idx_img, dy, dx, INVALID)
        cdat = jnp.roll(attrs, (-dy, -dx), axis=(1, 2))
        cvalid = (cand >= 0) & (cand != idx_img) & has_winner
        czp, cconf = cdat[sm.PZ], cdat[sm.CONF]
        cinit, clast = cdat[sm.INIT_T], cdat[sm.LAST_T]
        xy_dist = jnp.sqrt((cdat[sm.PX] - qx) ** 2 + (cdat[sm.PY] - qy) ** 2)
        # redundancy: older, confident, just behind, within radius
        red = (
            cvalid
            & (cinit < q_init)
            & (cconf > conf_threshold)
            & (czp > qz)
            & (czp - qz < 0.01)
            & (xy_dist < q_rad * 1.4)
        )
        count = count + red.astype(jnp.int32)
        zc = (
            cvalid
            & (clast == time)
            & (cconf > conf_threshold)
            & (czp > qz)
            & (czp - qz > 0.01)
            & (q_nz > 0.85)
        )
        z_count = z_count + zc.astype(jnp.int32)

    # see-through violation vs the input depth, 3x3 (copy_unstable:101-110)
    violations = jnp.zeros((h, w), jnp.int32)
    viol_sum = jnp.zeros((h, w), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            d = _shift_with_invalid(depth_input, dy, dx, 0.0)
            delta = d - qz
            hit = has_winner & (d > 0) & (delta > cfg.clean_see_through_gate)
            violations = violations + hit.astype(jnp.int32)
            viol_sum = viol_sum + jnp.where(hit, delta, 0.0)

    # per-pixel confidence penalty (copy_unstable:124-134)
    viol = violations > 0
    avg_v = viol_sum / jnp.maximum(violations.astype(jnp.float32), 1.0)
    pen = jnp.where(viol, 1.0 / (1.0 + cfg.outlier_coeff * avg_v), 1.0)
    mask_pen = (
        viol
        & (mask != mask_id)
        & (depth_input > qz - 0.05)
        & (depth_input < qz + 0.05)
    )
    pen = jnp.where(
        mask_pen, pen * (0.5 + 0.5 * (1.0 - cfg.outlier_coeff / 10.0)), pen
    )
    cull_vis = has_winner & ((count > 8) | (z_count > 4))

    # scatter per-pixel verdicts back to the winning surfels. Cull votes and
    # confidence penalties share ONE scatter-min: a cull vote encodes as -1
    # (dominates any penalty in [0,1]), otherwise the penalty itself.
    ids = jnp.where(has_winner, idx_img, cap).reshape(-1)
    verdict = jnp.where(cull_vis, -1.0, pen).reshape(-1)
    verdict_per_surfel = (
        jnp.ones((cap,), jnp.float32).at[ids].min(verdict, mode="drop")
    )
    cull_flags = (verdict_per_surfel < 0.0).astype(jnp.int32)
    pen_per_surfel = jnp.where(cull_flags == 1, 1.0, verdict_per_surfel)

    keep = smap.alive_mask() & (cull_flags == 0)
    # unstable-age cull: never reached confThreshold within the grace period
    unstable_dead = ((time - last_t) > cfg.unstable_grace) & (
        smap.data[sm.CONF] < conf_threshold
    )
    keep = keep & ~unstable_dead
    # inactive surfels are always kept (copy_unstable:122)
    keep = keep | (
        smap.alive_mask() & (last_t > 0) & (time - last_t > time_delta)
    )

    data = smap.data.at[sm.CONF].mul(pen_per_surfel)

    def _packed(d):
        packed, new_count = sm.compact(d, keep, cap)
        return sm.SurfelMap(data=packed, count=new_count)

    def _flagged(d):
        # cull = clear the ALIVE flag (elementwise, ~4x cheaper than the
        # repack); the high-water mark keeps the culled slots until the next
        # periodic compaction reclaims them
        d = d.at[sm.ALIVE].set(jnp.where(keep, d[sm.ALIVE], 0.0))
        return sm.SurfelMap(data=d, count=smap.count)

    # ``compact`` may be a static bool or a traced predicate (the engine
    # passes time % compact_every == 0): repacking survivors to the front
    # keeps the work bucket tracking the LIVE population instead of the
    # append high-water mark (~10k appends/frame measured), but the repack
    # is a [CHANNELS, bucket] scatter (~19 ms at 393k bucket) — far too hot
    # for every frame, so it runs on a period (SurfelConfig.compact_every).
    # The reference repacks its whole VBO every frame via transform feedback
    # (copy_unstable.geom) — free on a rasteriser, not on a TPU.
    if isinstance(compact, bool):
        return _packed(data) if compact else _flagged(data)
    return jax.lax.cond(compact, _packed, _flagged, data)


def _transform_per_owner(data: jnp.ndarray, own: jnp.ndarray,
                         poses: jnp.ndarray, n_models: int) -> jnp.ndarray:
    """transform_surfels with a per-column pose selected by `own` [N].

    One-hot accumulation over the (small, static) model count — M fused FMAs
    instead of a per-column 12-coefficient gather.
    """
    px, py, pz = data[sm.PX], data[sm.PY], data[sm.PZ]
    nx, ny, nz = data[sm.NX], data[sm.NY], data[sm.NZ]
    rows_p = [jnp.zeros_like(px) for _ in range(3)]
    rows_n = [jnp.zeros_like(px) for _ in range(3)]
    for m in range(n_models):
        R = poses[m, :3, :3]
        t = poses[m, :3, 3]
        sel = own == m
        for i in range(3):
            rows_p[i] = rows_p[i] + jnp.where(
                sel, R[i, 0] * px + R[i, 1] * py + R[i, 2] * pz + t[i], 0.0
            )
            rows_n[i] = rows_n[i] + jnp.where(
                sel, R[i, 0] * nx + R[i, 1] * ny + R[i, 2] * nz, 0.0
            )
    out = data
    for i, (rp, rn) in enumerate(((sm.PX, sm.NX), (sm.PY, sm.NY), (sm.PZ, sm.NZ))):
        out = out.at[rp].set(rows_p[i])
        out = out.at[rn].set(rows_n[i])
    return out


def fuse_flat(
    data_flat: jnp.ndarray,  # [CHANNELS, total] ALL models' surfels (model frames)
    counts: jnp.ndarray,  # [M] per-segment high-water marks
    seg_bases,  # static tuple, len M+1: segment boundaries in the flat array
    frame: sm.FrameSurfels,  # camera-frame candidates (weighted)
    index_map: IndexMap,  # owner-partitioned composite (predict_indices_flat)
    mask: jnp.ndarray,  # [H, W] int32 pixel owner = model id (>= M excluded)
    poses: jnp.ndarray,  # [M, 4, 4] model poses (camera -> model frame)
    max_depth_all: jnp.ndarray,  # [M]
    active_all: jnp.ndarray,  # [M] bool
    cam: CameraModel,
    time,
    cfg: SurfelConfig,
    attrs: jnp.ndarray,  # gather_attr_images of the composite index map
    win_model: jnp.ndarray,  # [H, W] model of each pixel's index-map winner
):
    """Composite fusion: ONE association/merge/append pass for ALL models.

    Same per-pixel semantics as `fuse` run per model (the mask partitions
    pixels, so each pixel only ever fused into its owner — reference
    data.vert maskID gate), but the image-sized window search, checkerboard
    extraction and scatter run ONCE instead of (1+S) times. The index map is
    the CROSS-MODEL composite (predict_indices_flat); candidate taps are
    gated to the pixel's mask owner's model (win_model(q) == mask(p)), so a
    pixel only ever merges into its owner — the reference's maskID gate.

    Returns (data_flat, counts) with per-segment appends.
    """
    from multimotionfusion_tpu.ops.rasterize import take_small

    h, w = cam.height, cam.width
    n_models = counts.shape[0]
    total = data_flat.shape[1]

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    xl = (xs - cam.cx) / cam.fx
    yl = (ys - cam.cy) / cam.fy

    fz = frame.data[sm.PZ].reshape(h, w)
    fnx = frame.data[sm.NX].reshape(h, w)
    fny = frame.data[sm.NY].reshape(h, w)
    fnz = frame.data[sm.NZ].reshape(h, w)

    ti = jnp.int32(time)
    xi = jnp.arange(w, dtype=jnp.int32)[None, :]
    yi = jnp.arange(h, dtype=jnp.int32)[:, None]
    checker = ((xi % 2) == (ti % 2)) & ((yi % 2) == (ti % 2))
    neigh_ok = (
        (_shift_with_invalid(fz, 0, -1, 0.0) > 0)
        & (_shift_with_invalid(fz, 0, 1, 0.0) > 0)
        & (_shift_with_invalid(fz, -1, 0, 0.0) > 0)
        & (_shift_with_invalid(fz, 1, 0, 0.0) > 0)
    )
    own_ok = mask < n_models
    active_px = take_small(active_all.astype(jnp.float32), mask, n_models) > 0.5
    maxd_px = take_small(max_depth_all, mask, n_models)
    participate = (
        checker
        & own_ok
        & active_px
        & neigh_ok
        & frame.valid.reshape(h, w)
        & (fz > 0)
        & (fz <= jnp.minimum(maxd_px, cfg.depth_cutoff))
    )

    # --- owner-gated window search over the composite index map -----------
    own_f = mask.astype(jnp.float32)
    wm_f = win_model.astype(jnp.float32)
    attrs_ext = jnp.concatenate([attrs, wm_f[None]], axis=0)
    wm_ch = attrs.shape[0]
    best_dist = jnp.full((h, w), jnp.float32(1000.0))
    best_tgt = jnp.full((h, w), INVALID)
    for dy, dx in _window_offsets(cfg.assoc_window):
        cand = _shift_with_invalid(index_map.index, dy, dx, INVALID)
        cvalid = cand >= 0
        cdat = jnp.roll(attrs_ext, (-dy, -dx), axis=(1, 2))
        # candidate surfel must BELONG to the pixel's owner (maskID gate)
        cvalid = cvalid & (cdat[wm_ch] == own_f)
        cpx, cpy, cpz = cdat[sm.PX], cdat[sm.PY], cdat[sm.PZ]
        zdiff = cpz - fz
        lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
        z_ok = jnp.abs(zdiff * lam) < cfg.assoc_depth_gate
        rx = yl * cpz - cpy
        ry = cpx - xl * cpz
        rz = xl * cpy - yl * cpx
        dist = jnp.sqrt(rx * rx + ry * ry + rz * rz)
        cnx, cny, cnz = cdat[sm.NX], cdat[sm.NY], cdat[sm.NZ]
        cosang = jnp.clip(cnx * fnx + cny * fny + cnz * fnz, -1.0, 1.0)
        n_ok = (jnp.abs(cnz) < 0.75) | (jnp.abs(jnp.arccos(cosang)) < 0.5)
        better = cvalid & z_ok & n_ok & (dist < best_dist)
        best_dist = jnp.where(better, dist, best_dist)
        best_tgt = jnp.where(better, cand, best_tgt)

    # --- checkerboard extraction (see fuse) --------------------------------
    par = ti % 2
    hc, wc = h // 2, w // 2
    n_cb = hc * wc
    stack = jnp.concatenate(
        [
            (participate & (best_tgt >= 0)).astype(jnp.float32)[None],
            best_tgt.astype(jnp.float32)[None],
            participate.astype(jnp.float32)[None],
            own_f[None],
            frame.data.reshape(sm.CHANNELS, h, w),
        ],
        axis=0,
    )
    rows = jax.lax.dynamic_slice(
        stack, (jnp.int32(0), par, jnp.int32(0)), (stack.shape[0], h - 1, w)
    )[:, ::2, :]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (w, wc), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (w, wc), 1) * 2 + par
    ).astype(jnp.float32)
    sel = jax.lax.optimization_barrier(sel)
    cb_all = jax.lax.dot_general(
        rows.reshape(-1, w), sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(stack.shape[0], hc, wc)

    merging = (cb_all[0] > 0.5).reshape(n_cb)
    target_img = cb_all[1].astype(jnp.int32)
    target = target_img.reshape(n_cb)
    own_cb = cb_all[3].astype(jnp.int32).reshape(n_cb)

    # --- merge (update.vert) in each pixel's OWNER's model frame -----------
    new_global = _transform_per_owner(
        cb_all[4:].reshape(sm.CHANNELS, n_cb), own_cb, poses, n_models
    )
    old_local = gather_attr_images(
        index_map.data_local, target_img
    ).reshape(sm.CHANNELS, n_cb)
    old = _transform_per_owner(old_local, own_cb, poses, n_models)

    c_k = old[sm.CONF]
    a = new_global[sm.CONF]
    csum = jnp.maximum(c_k + a, 1e-12)
    rad_ok = new_global[sm.RADIUS] < 1.5 * old[sm.RADIUS]

    def wavg(ch):
        return (c_k * old[ch] + a * new_global[ch]) / csum

    merged = old
    for ch in (sm.PX, sm.PY, sm.PZ, sm.CR, sm.CG, sm.CB):
        merged = merged.at[ch].set(jnp.where(rad_ok, wavg(ch), old[ch]))
    nmx, nmy, nmz = wavg(sm.NX), wavg(sm.NY), wavg(sm.NZ)
    nn = jnp.sqrt(jnp.maximum(nmx * nmx + nmy * nmy + nmz * nmz, 1e-12))
    merged = merged.at[sm.NX].set(jnp.where(rad_ok, nmx / nn, old[sm.NX]))
    merged = merged.at[sm.NY].set(jnp.where(rad_ok, nmy / nn, old[sm.NY]))
    merged = merged.at[sm.NZ].set(jnp.where(rad_ok, nmz / nn, old[sm.NZ]))
    merged = merged.at[sm.RADIUS].set(
        jnp.where(rad_ok, wavg(sm.RADIUS), old[sm.RADIUS])
    )
    merged = merged.at[sm.CONF].set(c_k + a)
    merged = merged.at[sm.LAST_T].set(jnp.float32(time))

    # --- per-model appends --------------------------------------------------
    new_mask = (cb_all[2] > 0.5).reshape(n_cb) & ~merging
    # rank of each appending pixel WITHIN its model: one [n_cb, M] cumsum
    oh = jnp.stack(
        [(new_mask & (own_cb == m)).astype(jnp.float32) for m in range(n_models)],
        axis=-1,
    )
    cums = jnp.cumsum(oh, axis=0)  # [n_cb, M]
    rank = jnp.zeros((n_cb,), jnp.int32)
    base = jnp.zeros((n_cb,), jnp.int32)
    segcap_end = jnp.zeros((n_cb,), jnp.int32)
    for m in range(n_models):
        selm = own_cb == m
        rank = jnp.where(selm, cums[:, m].astype(jnp.int32) - 1, rank)
        base = jnp.where(selm, seg_bases[m] + counts[m], base)
        segcap_end = jnp.where(selm, seg_bases[m + 1], segcap_end)
    append_dst = base + rank
    append_dst = jnp.where(
        new_mask & (append_dst < segcap_end), append_dst, total
    )
    n_new = jnp.stack(
        [
            jnp.minimum(
                jnp.sum(oh[:, m]).astype(jnp.int32),
                jnp.maximum(seg_bases[m + 1] - seg_bases[m] - counts[m], 0),
            )
            for m in range(n_models)
        ]
    )

    merge_dst = jnp.where(merging, target, total)
    dst = jnp.concatenate([merge_dst, append_dst])
    vals = jnp.concatenate([merged, new_global], axis=1)
    n_src = 2 * n_cb
    src_ids = jnp.arange(n_src, dtype=jnp.int32)
    inv = jnp.full((total,), n_src, jnp.int32).at[dst].min(src_ids, mode="drop")
    updated = inv < n_src
    upd = vals[:, jnp.minimum(inv, n_src - 1)]
    data = jnp.where(updated[None], upd, data_flat)
    return data, counts + n_new


def clean_flat(
    data_flat: jnp.ndarray,  # [CHANNELS, total] POST-fuse flat storage
    counts: jnp.ndarray,  # [M]
    seg_model: jnp.ndarray,  # [total] int32 model id per slot
    alive: jnp.ndarray,  # [total] bool (post-fuse)
    index_map: IndexMap,
    depth_input: jnp.ndarray,
    conf_all: jnp.ndarray,  # [M] per-model confidence gates
    cam: CameraModel,
    time,
    time_delta,
    cfg: SurfelConfig,
    attrs: jnp.ndarray,
    win_model: jnp.ndarray,  # [H, W] model of each pixel's index-map winner
):
    """Composite clean: ONE image pass + ONE verdict scatter for ALL models.

    Mirrors `clean` per model (copy_unstable.vert tests). The per-pixel
    winner is the front-most surfel ACROSS models; window candidates are
    gated to the SAME model as the centre's winner (the reference evaluates
    each model's map against itself), with that model's confidence gate.
    Compaction is NOT done here — the caller repacks segments periodically.
    Returns data_flat with penalties applied and ALIVE flags cleared.
    """
    from multimotionfusion_tpu.ops.rasterize import take_small

    h, w = cam.height, cam.width
    n_models = conf_all.shape[0]
    total = data_flat.shape[1]
    last_t = data_flat[sm.LAST_T]

    idx_img = index_map.index
    own_f = win_model.astype(jnp.float32)
    conf_px = take_small(conf_all, win_model, n_models)
    attrs_ext = jnp.concatenate(
        [attrs, own_f[None], conf_px[None]], axis=0
    )
    own_ch = attrs.shape[0]
    conf_ch = attrs.shape[0] + 1
    qx, qy, qz = attrs[sm.PX], attrs[sm.PY], attrs[sm.PZ]
    q_init = attrs[sm.INIT_T]
    q_rad = attrs[sm.RADIUS]
    q_nz = jnp.abs(attrs[sm.NZ])
    has_winner = idx_img >= 0

    count = jnp.zeros((h, w), jnp.int32)
    z_count = jnp.zeros((h, w), jnp.int32)
    for dy, dx in _window_offsets(cfg.assoc_window):
        cand = _shift_with_invalid(idx_img, dy, dx, INVALID)
        cdat = jnp.roll(attrs_ext, (-dy, -dx), axis=(1, 2))
        cvalid = (
            (cand >= 0) & (cand != idx_img) & has_winner
            & (cdat[own_ch] == own_f)
        )
        czp, cconf = cdat[sm.PZ], cdat[sm.CONF]
        cinit, clast = cdat[sm.INIT_T], cdat[sm.LAST_T]
        cgate = cdat[conf_ch]
        xy_dist = jnp.sqrt((cdat[sm.PX] - qx) ** 2 + (cdat[sm.PY] - qy) ** 2)
        red = (
            cvalid
            & (cinit < q_init)
            & (cconf > cgate)
            & (czp > qz)
            & (czp - qz < 0.01)
            & (xy_dist < q_rad * 1.4)
        )
        count = count + red.astype(jnp.int32)
        zc = (
            cvalid
            & (clast == time)
            & (cconf > cgate)
            & (czp > qz)
            & (czp - qz > 0.01)
            & (q_nz > 0.85)
        )
        z_count = z_count + zc.astype(jnp.int32)

    violations = jnp.zeros((h, w), jnp.int32)
    viol_sum = jnp.zeros((h, w), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            d = _shift_with_invalid(depth_input, dy, dx, 0.0)
            delta = d - qz
            hit = has_winner & (d > 0) & (delta > cfg.clean_see_through_gate)
            violations = violations + hit.astype(jnp.int32)
            viol_sum = viol_sum + jnp.where(hit, delta, 0.0)

    viol = violations > 0
    avg_v = viol_sum / jnp.maximum(violations.astype(jnp.float32), 1.0)
    pen = jnp.where(viol, 1.0 / (1.0 + cfg.outlier_coeff * avg_v), 1.0)
    # composite note: the winner at p IS p's owner's surfel, so the
    # reference's foreign-mask softening (mask != mask_id) never applies
    cull_vis = has_winner & ((count > 8) | (z_count > 4))

    ids = jnp.where(has_winner, idx_img, total).reshape(-1)
    verdict = jnp.where(cull_vis, -1.0, pen).reshape(-1)
    verdict_per_surfel = (
        jnp.ones((total,), jnp.float32).at[ids].min(verdict, mode="drop")
    )
    cull_flags = verdict_per_surfel < 0.0
    pen_per_surfel = jnp.where(cull_flags, 1.0, verdict_per_surfel)

    conf_t_surf = take_small(conf_all, seg_model, n_models)
    keep = alive & ~cull_flags
    unstable_dead = ((time - last_t) > cfg.unstable_grace) & (
        data_flat[sm.CONF] < conf_t_surf
    )
    keep = keep & ~unstable_dead
    keep = keep | (alive & (last_t > 0) & (time - last_t > time_delta))

    data = data_flat.at[sm.CONF].mul(pen_per_surfel)
    data = data.at[sm.ALIVE].set(jnp.where(keep, data[sm.ALIVE], 0.0))
    return data


def compact_map(smap: sm.SurfelMap) -> sm.SurfelMap:
    """Maintenance pass: repack live surfels to the front of the storage.

    Run when the high-water mark approaches capacity (host decision); the
    reference instead streams + repacks the whole VBO every frame.
    """
    packed, new_count = sm.compact(smap.data, smap.alive_mask(), smap.capacity)
    return sm.SurfelMap(data=packed, count=new_count)
