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

import jax.numpy as jnp

from multimotionfusion_tpu.config import CameraModel, SurfelConfig
from multimotionfusion_tpu.model import surfel_map as sm
from multimotionfusion_tpu.ops.rasterize import INVALID, IndexMap

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
    dl = index_map.data_local
    cpx_all, cpy_all, cpz_all = dl[sm.PX], dl[sm.PY], dl[sm.PZ]
    cnx_all, cny_all, cnz_all = dl[sm.NX], dl[sm.NY], dl[sm.NZ]

    best_dist = jnp.full((h, w), jnp.float32(1000.0))
    best_tgt = jnp.full((h, w), INVALID)
    for dy, dx in _window_offsets(cfg.assoc_window):
        cand = _shift_with_invalid(index_map.index, dy, dx, INVALID)
        cvalid = cand >= 0
        s = jnp.maximum(cand, 0)
        cpx, cpy, cpz = jnp.take(cpx_all, s), jnp.take(cpy_all, s), jnp.take(cpz_all, s)
        zdiff = cpz - fz
        z_ok = jnp.abs(zdiff * lam) < cfg.assoc_depth_gate
        # dist = |cross(ray, cand_pos)|, ray = (xl, yl, 1)
        rx = yl * cpz - cpy
        ry = cpx - xl * cpz
        rz = xl * cpy - yl * cpx
        dist = jnp.sqrt(rx * rx + ry * ry + rz * rz)
        cnx, cny, cnz = jnp.take(cnx_all, s), jnp.take(cny_all, s), jnp.take(cnz_all, s)
        # normal conformance: |n_z| < 0.75 or angle(n_cand, n_frame) < 0.5 rad
        cosang = jnp.clip(cnx * fnx + cny * fny + cnz * fnz, -1.0, 1.0)
        n_ok = (jnp.abs(cnz) < 0.75) | (jnp.abs(jnp.arccos(cosang)) < 0.5)
        better = cvalid & z_ok & n_ok & (dist < best_dist)
        best_dist = jnp.where(better, dist, best_dist)
        best_tgt = jnp.where(better, cand, best_tgt)

    merging = (participate & (best_tgt >= 0)).reshape(n_pix)
    target = best_tgt.reshape(n_pix)

    # one winning pixel per target surfel (GL: last write wins; here: min id)
    pix_ids = jnp.arange(n_pix, dtype=jnp.int32)
    tgt_safe = jnp.where(merging, target, smap.capacity)
    winner_of = (
        jnp.full((smap.capacity + 1,), _IMAX).at[tgt_safe].min(pix_ids)
    )
    is_winner = merging & (winner_of[tgt_safe] == pix_ids)

    # --- merge (update.vert:57-97) ----------------------------------------
    new_global = sm.transform_surfels(frame.data, pose)  # [C, n_pix]
    old = smap.data[:, jnp.where(is_winner, target, 0)]  # gather, [C, n_pix]

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

    data = smap.data.at[:, jnp.where(is_winner, target, smap.capacity)].set(
        merged, mode="drop"
    )
    fused = sm.SurfelMap(data=data, count=smap.count)

    # --- append new unstable (data.vert updateId=2 -> newUnstableBuffer) --
    new_mask = participate.reshape(n_pix) & ~merging
    return sm.append(fused, new_global, new_mask)


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
) -> sm.SurfelMap:
    """Outlier cull + redundancy cull + compaction (copy_unstable.vert).

    Deformation-graph application (nodeSampler path, copy_unstable.vert:140+)
    is layered separately: apply the graph to smap.data before calling clean.
    """
    from multimotionfusion_tpu.utils import se3

    h, w = cam.height, cam.width
    cap = smap.capacity
    data_local = sm.transform_surfels(smap.data, se3.inverse_T(pose))
    lx, ly, lz = data_local[sm.PX], data_local[sm.PY], data_local[sm.PZ]
    safe_z = jnp.where(lz > 0, lz, 1.0)
    x = lx * cam.fx / safe_z + cam.cx
    y = ly * cam.fy / safe_z + cam.cy
    ui = jnp.rint(x).astype(jnp.int32)
    vi = jnp.rint(y).astype(jnp.int32)
    inb = (x > 0) & (y > 0) & (x < w) & (y < h) & (lz > 0)
    last_t = smap.data[sm.LAST_T]
    init_t = smap.data[sm.INIT_T]
    active = (time - last_t < time_delta) & inb  # outer gate, copy_unstable:66

    nrm_local = data_local[sm.NORMAL]
    nz_abs = jnp.abs(nrm_local[2])

    # image-side candidate attributes (the surfels visible in the index map)
    dl = index_map.data_local
    idx_img = index_map.index  # [H, W]

    ui_c = jnp.clip(ui, 0, w - 1)
    vi_c = jnp.clip(vi, 0, h - 1)

    count = jnp.zeros((cap,), jnp.int32)
    z_count = jnp.zeros((cap,), jnp.int32)
    for dy, dx in _window_offsets(cfg.assoc_window):
        cand = jnp.take(
            _shift_with_invalid(idx_img, dy, dx, INVALID).reshape(-1),
            vi_c * w + ui_c,
        )
        cvalid = (cand >= 0) & (cand != jnp.arange(cap)) & active
        s = jnp.maximum(cand, 0)
        czp = jnp.take(dl[sm.PZ], s)
        cconf = jnp.take(dl[sm.CONF], s)
        cinit = jnp.take(dl[sm.INIT_T], s)
        clast = jnp.take(dl[sm.LAST_T], s)
        cxp = jnp.take(dl[sm.PX], s)
        cyp = jnp.take(dl[sm.PY], s)
        xy_dist = jnp.sqrt((cxp - lx) ** 2 + (cyp - ly) ** 2)
        # redundancy: older, confident, just behind, within radius
        red = (
            cvalid
            & (cinit < init_t)
            & (cconf > conf_threshold)
            & (czp > lz)
            & (czp - lz < 0.01)
            & (xy_dist < smap.data[sm.RADIUS] * 1.4)
        )
        count = count + red.astype(jnp.int32)
        zc = (
            cvalid
            & (clast == time)
            & (cconf > conf_threshold)
            & (czp > lz)
            & (czp - lz > 0.01)
            & (nz_abs > 0.85)
        )
        z_count = z_count + zc.astype(jnp.int32)

    # see-through violation vs the input depth, 3x3 (copy_unstable:101-110)
    violations = jnp.zeros((cap,), jnp.int32)
    viol_sum = jnp.zeros((cap,), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            d = jnp.take(
                _shift_with_invalid(depth_input, dy, dx, 0.0).reshape(-1),
                vi_c * w + ui_c,
            )
            delta = d - lz
            hit = active & (d > 0) & (delta > cfg.clean_see_through_gate)
            violations = violations + hit.astype(jnp.int32)
            viol_sum = viol_sum + jnp.where(hit, delta, 0.0)

    keep = jnp.ones((cap,), bool)
    keep = keep & ~((count > 8) | (z_count > 4))
    # unstable-age cull: never reached confThreshold within the grace period
    unstable_dead = ((time - last_t) > cfg.unstable_grace) & (
        smap.data[sm.CONF] < conf_threshold
    )
    keep = keep & ~unstable_dead
    # inactive surfels are always kept (copy_unstable:122)
    keep = keep | ((last_t > 0) & (time - last_t > time_delta))
    keep = keep & smap.alive_mask()

    # confidence penalties for violations (copy_unstable:124-134)
    viol = violations > 0
    avg_v = viol_sum / jnp.maximum(violations.astype(jnp.float32), 1.0)
    conf = smap.data[sm.CONF]
    conf = jnp.where(viol, conf / (1.0 + cfg.outlier_coeff * avg_v), conf)
    centre_mask = jnp.take(mask.reshape(-1), vi_c * w + ui_c)
    centre_depth = jnp.take(depth_input.reshape(-1), vi_c * w + ui_c)
    mask_pen = (
        viol
        & (centre_mask != mask_id)
        & (centre_depth > lz - 0.05)
        & (centre_depth < lz + 0.05)
    )
    conf = jnp.where(
        mask_pen, conf * (0.5 + 0.5 * (1.0 - cfg.outlier_coeff / 10.0)), conf
    )
    data = smap.data.at[sm.CONF].set(conf)

    packed, new_count = sm.compact(data, keep, cap)
    return sm.SurfelMap(data=packed, count=new_count)
