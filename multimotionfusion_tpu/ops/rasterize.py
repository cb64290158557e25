"""Point rasterisation of surfel maps on TPU.

Replaces two OpenGL render passes of the reference with scatter/gather
programs:

- ``predict_indices`` == the index-map render (reference
  Core/Model/ModelProjection.cpp:105-157 + Core/Shaders/index_map.vert/.frag):
  per-pixel id of the front-most surfel, used by fuse/clean for data
  association. GL's depth test becomes a two-pass scatter-min (depth first,
  then lowest surfel id among exact-depth ties), which is deterministic —
  unlike GL, where ties are rasteriser-order dependent.

- ``splat_predict`` == the surfel splatting render (ModelProjection.cpp:192-273
  + Core/Shaders/splat.vert / combo_splat.frag): predicted colour / vertex+conf
  / normal+radius / time maps. GL draws each surfel as a screen-aligned point
  sprite sized by its projected radius and lets the ROP depth-test fragments;
  here every surfel scatters only its centre pixel, then a dense KxK
  neighbourhood-resolve pass re-derives each pixel's covering surfel by
  ray-disk intersection (the same test combo_splat.frag runs per fragment).
  That turns millions of scattered fragments into K^2 vectorised image-shaped
  gathers — the shape XLA/TPU wants — at the cost of capping the splat
  footprint at K pixels (GL point sprites are hardware-capped too).

Surfel attributes enter in the *camera frame* (callers pre-transform with
``surfel_map.transform_surfels(data, inv(pose))``), matching index_map.vert
which emits t_inv-transformed attributes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from multimotionfusion_tpu.config import CameraModel
from multimotionfusion_tpu.model import surfel_map as sm

INVALID = jnp.int32(-1)
_BIG = jnp.float32(3.4e38)


class IndexMap(NamedTuple):
    index: jnp.ndarray  # [H*scale, W*scale] int32 surfel id, -1 = none
    data_local: jnp.ndarray  # [CHANNELS, capacity] camera-frame surfel attributes

    def gather(self, channel) -> jnp.ndarray:
        """Image of one attribute channel (or slice) at the winning surfel;
        zeros where no surfel. Returns [H, W] or [H, W, C]."""
        ch = self.data_local[channel]
        safe = jnp.maximum(self.index, 0)
        img = jnp.take(ch, safe, axis=-1)  # [C?, H, W]
        if img.ndim == 3:
            img = jnp.moveaxis(img, 0, -1)
            return jnp.where((self.index >= 0)[..., None], img, 0.0)
        return jnp.where(self.index >= 0, img, 0.0)


def gather_attr_images(data_local: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """[CHANNELS, H, W] winner-surfel attributes per pixel (zeros where none).

    One gather with pixel-count indices; all window/stencil logic downstream
    then runs on [H, W] images, which XLA fuses into stencil loops — per-tap
    per-SURFEL gathers (1M indices x 16 channels) cost ~30 ms each on TPU,
    per-pixel attr images make the same taps effectively free.
    """
    img = data_local[:, jnp.maximum(index, 0)]
    return jnp.where((index >= 0)[None], img, 0.0)


def _project_pixels(data_local: jnp.ndarray, cam: CameraModel, scale: int):
    """Project camera-frame surfel centres to integer pixels at `scale`."""
    x, y, z = data_local[sm.PX], data_local[sm.PY], data_local[sm.PZ]
    safe_z = jnp.where(z > 0, z, 1.0)
    u = jnp.rint(scale * (x * cam.fx / safe_z + cam.cx)).astype(jnp.int32)
    v = jnp.rint(scale * (y * cam.fy / safe_z + cam.cy)).astype(jnp.int32)
    inb = (u >= 0) & (v >= 0) & (u < cam.width * scale) & (v < cam.height * scale)
    return u, v, inb


# Packed depth-test key: log-quantized depth bits + surfel id bits in one
# int32. GL's f32 depth test (index_map.vert) needs TWO scatter passes
# plus a winner gather on TPU (min depth, then min id among exact-depth ties);
# one packed scatter-min is ~3x cheaper and still deterministic. Quantization
# at the default 20 id bits: 2048 log2 levels over [1/16 m, 16 m] = 256
# levels/octave = 0.27% relative depth resolution (2.7 mm at 1 m) — ties
# within one step resolve to the lowest id. All downstream consumers
# (association gates at >= 1 cm, the ray-disk splat resolve which re-derives
# exact depth from the winning candidates) are insensitive at this scale.
# Flat multi-model buckets above 2^20 surfels get 21 id bits / 1024 levels
# (0.54%) — still far below every gate.
_ID_BITS = 20
_KEY_INVALID = jnp.int32(2**31 - 1)


def _id_bits_for(n: int) -> int:
    bits = _ID_BITS
    while (1 << bits) < n:
        bits += 1
    assert bits <= 24, "surfel bucket exceeds packed id range"
    return bits


def _pack_depth_id(z, ids, valid, id_bits: int = _ID_BITS):
    # top bin reserved (clip to levels - 2): geometry beyond 16 m would
    # otherwise all collapse into one bin where the max (zq, id) pair equals
    # _KEY_INVALID, making that surfel unable to win any pixel (viewer paths
    # render with max_depth up to 50 m)
    levels = 1 << (31 - id_bits)
    zq = (jnp.log2(jnp.maximum(z, 1e-6)) + 4.0) * (levels / 8.0)
    zq = jnp.clip(zq.astype(jnp.int32), 0, levels - 2)
    return jnp.where(valid, (zq << id_bits) | ids, _KEY_INVALID)


def _unpack_zmin(kmin, id_bits: int = _ID_BITS):
    levels = 1 << (31 - id_bits)
    won = kmin != _KEY_INVALID
    idx = jnp.where(won, kmin & ((1 << id_bits) - 1), INVALID)
    zmin = jnp.where(
        won,
        jnp.exp2((kmin >> id_bits).astype(jnp.float32) * (8.0 / levels) - 4.0),
        _BIG,
    )
    return idx, zmin


def _zmin_scatter(u, v, z, valid, h: int, w: int):
    """Front-most valid surfel per pixel. Returns (index [H,W] or -1, zmin).

    zmin is the dequantized winning depth (0.27% relative) — no consumer in
    this codebase uses it for sub-centimetre tests.
    """
    n = z.shape[0]
    id_bits = _id_bits_for(n)
    pix = jnp.where(valid, v * w + u, h * w)  # invalid -> scratch bin
    ids = jnp.arange(n, dtype=jnp.int32)
    key = _pack_depth_id(z, ids, valid, id_bits)
    kmin = jnp.full((h * w,), _KEY_INVALID).at[pix].min(key, mode="drop")
    idx, zmin = _unpack_zmin(kmin, id_bits)
    return idx.reshape(h, w), zmin.reshape(h, w)


def predict_indices(
    smap: sm.SurfelMap,
    pose: jnp.ndarray,  # [4,4] model pose (camera -> global)
    cam: CameraModel,
    time,
    time_delta,
    max_depth: float,
    scale: int = 1,
) -> IndexMap:
    """Data-association index map (index_map.vert gates: 0 < z <= maxDepth and
    time - last_update <= timeDelta; note: no confidence gate)."""
    from multimotionfusion_tpu.utils import se3

    data_local = sm.transform_surfels(smap.data, se3.inverse_T(pose))
    z = data_local[sm.PZ]
    ok = (
        smap.alive_mask()
        & (z > 0)
        & (z <= max_depth)
        & (time - data_local[sm.LAST_T] <= time_delta)
    )
    u, v, inb = _project_pixels(data_local, cam, scale)
    idx, _ = _zmin_scatter(u, v, z, ok & inb, cam.height * scale, cam.width * scale)
    return IndexMap(index=idx, data_local=data_local)


def take_small(table: jnp.ndarray, idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """table[idx] for a SMALL static table (n entries) via one-hot selects.

    A real gather with image/surfel-count indices costs milliseconds on TPU;
    n fused compare-selects on the VPU are effectively free for n <= ~16.
    Out-of-range idx -> 0.
    """
    acc = jnp.zeros(idx.shape, table.dtype)
    for m in range(n):
        acc = acc + jnp.where(idx == m, table[m], jnp.zeros((), table.dtype))
    return acc


def predict_indices_flat(
    data_local: jnp.ndarray,  # [CHANNELS, total] camera-frame surfels, ALL models
    alive: jnp.ndarray,  # [total] bool
    seg_model: jnp.ndarray,  # [total] int32 model id of each surfel slot
    max_depth_all: jnp.ndarray,  # [n_models] per-model max depth
    n_models: int,
    cam: CameraModel,
    time,
    time_delta,
    z_priority: float = 0.02,
) -> IndexMap:
    """Cross-model composite index map over ALL models' surfels (flat ids).

    The reference renders ONE index map per model over the full image
    (ModelProjection::predictIndices per model); downstream consumers gate
    per pixel by model. Here ONE scatter z-tests ALL models together; each
    consumer gates candidates by the winner's model (win_model_image), so a
    model's surfels are visible over its FULL projected footprint — not just
    its (one-frame-stale) mask — which is what object tracking needs: the
    mask lags a mover by its per-frame motion, and an owner-restricted
    prediction erodes exactly the associations that carry the motion signal.

    Depth ties (an object overlapping its not-yet-culled stale copy in the
    global map) break to the OBJECT: object surfels get a small depth
    priority (z_priority, default 2 cm) plus an is-global tie bit in the
    packed key. Without the margin, the stale copy — the SAME surface fused
    at the object's previous positions — is genuinely nearer on the motion's
    trailing side (a laterally shifted sphere is closer on one flank), so it
    erodes the object's rendered footprint asymmetrically and biases its
    tracking associations FORWARD (measured ~50% tangential overshoot). A
    real occluder in front by more than the margin still wins.
    """
    h, w = cam.height, cam.width
    z = data_local[sm.PZ]
    maxd = take_small(max_depth_all, seg_model, n_models)
    ok = (
        alive
        & (z > 0)
        & (z <= maxd)
        & (time - data_local[sm.LAST_T] <= time_delta)
    )
    u, v, inb = _project_pixels(data_local, cam, 1)
    ok = ok & inb
    n = z.shape[0]
    id_bits = _id_bits_for(n)
    assert id_bits <= 22, "flat bucket exceeds packed id+priority range"
    levels = 1 << (30 - id_bits)
    z_eff = jnp.where(seg_model > 0, jnp.maximum(z - z_priority, 1e-3), z)
    zq = (jnp.log2(jnp.maximum(z_eff, 1e-6)) + 4.0) * (levels / 8.0)
    zq = jnp.clip(zq.astype(jnp.int32), 0, levels - 2)
    prio = (seg_model == 0).astype(jnp.int32)  # 1 = global (loses ties)
    ids = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(ok, (zq << (id_bits + 1)) | (prio << id_bits) | ids,
                    _KEY_INVALID)
    pix = jnp.where(ok, v * w + u, h * w)
    kmin = jnp.full((h * w,), _KEY_INVALID).at[pix].min(key, mode="drop")
    won = kmin != _KEY_INVALID
    idx = jnp.where(won, kmin & ((1 << id_bits) - 1), INVALID)
    return IndexMap(index=idx.reshape(h, w), data_local=data_local)


def win_model_image(index: jnp.ndarray, seg_bases, n_models: int) -> jnp.ndarray:
    """[H, W] model id of each pixel's winning surfel (n_models where none).

    Flat ids are segment-contiguous, so the model falls out of range
    comparisons — no gather.
    """
    out = jnp.full(index.shape, n_models, jnp.int32)
    for m in range(n_models):
        hit = (index >= seg_bases[m]) & (index < seg_bases[m + 1])
        out = jnp.where(hit, m, out)
    return out


def render_model_depths(
    data_local: jnp.ndarray,  # [CHANNELS, total] camera-frame surfels
    alive: jnp.ndarray,  # [total]
    seg_model: jnp.ndarray,  # [total] int32
    conf_all: jnp.ndarray,  # [n_models] per-model confidence gate
    max_depth_all: jnp.ndarray,  # [n_models]
    n_models: int,
    cam_c: CameraModel,  # CRF-scale camera (e.g. 160x120)
    time,
    time_delta,
) -> jnp.ndarray:
    """[n_models, Hc, Wc] per-model predicted depth at CRF scale.

    Feeds the segmentation's reprojection probability (Segmentation.cpp:
    819-862) — "does model m's geometry explain pixel p", for EVERY model at
    EVERY pixel, which the owner-partitioned composite cannot answer. One
    scatter-min into an [M * Hc * Wc] buffer (destination offset by the
    surfel's model) replaces M full-resolution splat passes; 12+ zq bits at
    CRF scale keep ~0.2% depth resolution, far below sigma_depth (3 cm).

    Confidence-gating piggybacks on the key's top bit: conf-gated surfels
    always beat ungated ones, among equals the nearest wins — the gated-first
    -with-ungated-fallback semantics of the previous per-model splats (young
    maps still render; one-shot junk cannot shadow mature surfels).
    """
    hc, wc = cam_c.height, cam_c.width
    z = data_local[sm.PZ]
    maxd = take_small(max_depth_all, seg_model, n_models)
    conf_t = take_small(conf_all, seg_model, n_models)
    ok = (
        alive
        & (z > 0)
        & (z <= maxd)
        & (time - data_local[sm.LAST_T] <= time_delta)
        & (seg_model < n_models)
    )
    u, v, inb = _project_pixels(data_local, cam_c, 1)
    ok = ok & inb
    miss = (data_local[sm.CONF] < conf_t).astype(jnp.int32)
    levels = 1 << 20
    zq = (jnp.log2(jnp.maximum(z, 1e-6)) + 4.0) * (levels / 8.0)
    zq = jnp.clip(zq.astype(jnp.int32), 0, levels - 2)
    key = jnp.where(ok, (miss << 21) | zq, _KEY_INVALID)
    npix = hc * wc
    pix = jnp.where(ok, seg_model * npix + v * wc + u, n_models * npix)
    kmin = jnp.full((n_models * npix,), _KEY_INVALID).at[pix].min(
        key, mode="drop"
    )
    won = kmin != _KEY_INVALID
    zw = jnp.exp2(
        (kmin & (levels - 1)).astype(jnp.float32) * (8.0 / levels) - 4.0
    )
    depth = jnp.where(won, zw, 0.0).reshape(n_models, hc, wc)
    # (a splat-disk-analogue hole fill — neighbour-min into empty cells —
    # was tried here and reverted: extending every model's pred footprint by
    # 1-2 ring cells shifts the covered/in-front outlier gates enough to
    # destabilise the five-mover lifecycle; coverage density is instead
    # guaranteed by the caller's conservative strides)
    return depth


class PredictedMaps(NamedTuple):
    """== the combinedPredict outputs (ModelProjection.h:83-114)."""

    color: jnp.ndarray  # [H, W, 3] 0..255, zeros where empty
    vertex_conf: jnp.ndarray  # [H, W, 4] camera-frame vertex + confidence
    normal_rad: jnp.ndarray  # [H, W, 4] camera-frame normal + radius
    time: jnp.ndarray  # [H, W] int32 init time of covering surfel
    valid: jnp.ndarray  # [H, W] bool


def splat_predict(
    smap: sm.SurfelMap,
    pose: jnp.ndarray,
    cam: CameraModel,
    conf_threshold,
    time,
    max_time,
    time_delta,
    max_depth: float,
    window: int = 5,
) -> PredictedMaps:
    """Surfel splatting (splat.vert gates + combo_splat.frag ray-disk resolve).

    Gates (splat.vert:40): drop if z > maxDepth, z < 0, conf < confThreshold,
    time - time_delta > last_update, or last_update > maxTime. The active /
    inactive ("old") prediction variants of the reference are this function
    called with different (time, max_time, time_delta) windows.
    """
    from multimotionfusion_tpu.utils import se3

    h, w = cam.height, cam.width
    data_local = sm.transform_surfels(smap.data, se3.inverse_T(pose))
    z = data_local[sm.PZ]
    ok = (
        smap.alive_mask()
        & (z > 0)
        & (z <= max_depth)
        & (data_local[sm.CONF] >= conf_threshold)
        & (time - data_local[sm.LAST_T] <= time_delta)
        & (data_local[sm.LAST_T] <= max_time)
    )
    u, v, inb = _project_pixels(data_local, cam, 1)
    centre_idx, _ = _zmin_scatter(u, v, z, ok & inb, h, w)
    im = IndexMap(index=centre_idx, data_local=data_local)
    return splat_resolve(
        im, cam, conf_threshold, time, max_time, time_delta, window,
        pre_gated=True,
    )


def splat_resolve(
    index_map: IndexMap,
    cam: CameraModel,
    conf_threshold,
    time,
    max_time,
    time_delta,
    window: int = 5,
    pre_gated: bool = False,
    attrs: jnp.ndarray | None = None,
    with_ungated_depth: bool = False,
    conf_img: jnp.ndarray | None = None,  # [H, W] per-pixel conf gate
    own_img: jnp.ndarray | None = None,  # [H, W] int32 owner (composite mode)
):
    """combo_splat.frag ray-disk resolve over an existing index map.

    With pre_gated=False this reuses the data-association index map (which has
    NO confidence gate) and applies the splat.vert gates per candidate inside
    the resolve instead — saving a whole scatter pass per frame. The only
    semantic difference from a dedicated gated z-min render: a gated-out
    surfel can occupy a centre pixel and shadow a gated-in one exactly behind
    it; neighbouring pixels' candidates almost always cover such pixels.

    with_ungated_depth=True additionally returns a [H, W] depth image that
    ignores the confidence/time gates (zeros where no surfel) — the
    segmentation's reprojection term asks "does this model's GEOMETRY explain
    the pixel", which must not depend on surfel maturity: a one-frame-old
    global map would otherwise render nothing at conf_threshold 10 and the
    whole image would look like an outlier segment (reference counterpart:
    getVertexConfProjection in Segmentation.cpp:825-830 — vacuous there with
    one model because of their row normalisation). Costs a couple of selects
    inside the existing tap loop instead of a second resolve pass. Returns
    (PredictedMaps, depth) when set, PredictedMaps otherwise.
    """
    h, w = cam.height, cam.width
    data_local = index_map.data_local
    centre_idx = index_map.index

    # --- neighbourhood resolve (combo_splat.frag) -------------------------
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    lx = (xs - cam.cx) / cam.fx
    ly = (ys - cam.cy) / cam.fy
    lnorm = jnp.sqrt(lx * lx + ly * ly + 1.0)
    l0, l1, l2 = lx / lnorm, ly / lnorm, 1.0 / lnorm  # unit pixel ray

    # per-pixel winner attributes, then every tap is a stencil roll of images
    # (fused by XLA into one loop; no per-surfel gathers in the tap loop).
    # Callers that already hold the winner-attribute images pass them in —
    # the gather costs ~1.4 ms at 640x480 and fuse/clean need the same one.
    if attrs is None:
        attrs = gather_attr_images(data_local, centre_idx)  # [CHANNELS, H, W]

    # composite (multi-model) mode: the per-pixel confidence gate and owner
    # ride as EXTRA attr channels so the tap loop's roll carries the
    # CANDIDATE's gate/owner alongside its attributes
    n_ch = attrs.shape[0]
    extra = []
    conf_ch = own_ch = None
    if conf_img is not None:
        conf_ch = n_ch + len(extra)
        extra.append(conf_img[None])
    if own_img is not None:
        own_ch = n_ch + len(extra)
        extra.append(own_img.astype(jnp.float32)[None])
        own_f = own_img.astype(jnp.float32)
    if extra:
        attrs = jnp.concatenate([attrs] + extra, axis=0)

    # the resolve CARRIES the winning candidate's attributes through the tap
    # loop (a handful of per-tap selects on the VPU) instead of re-gathering
    # them by best_idx afterwards — the [H*W, C] winner gather costs ~1.4 ms
    # at 640x480 on TPU while the selects fuse into the existing tap loop
    _WIN_CH = (sm.CR, sm.CG, sm.CB, sm.CONF, sm.NX, sm.NY, sm.NZ, sm.RADIUS,
               sm.INIT_T)
    best_z = jnp.full((h, w), _BIG)
    best_zu = jnp.full((h, w), _BIG)  # ungated variant (see docstring)
    best_idx = jnp.full((h, w), INVALID)
    best_att = [jnp.zeros((h, w), jnp.float32) for _ in _WIN_CH]
    r = window // 2
    for dy in range(-r, window - r):
        for dx in range(-r, window - r):
            cand = jnp.roll(centre_idx, (-dy, -dx), axis=(0, 1))
            cdat = jnp.roll(attrs, (-dy, -dx), axis=(1, 2))
            # border rolls wrap; invalidate wrapped rows/cols
            if dy > 0:
                cand = cand.at[h - dy :, :].set(INVALID)
            elif dy < 0:
                cand = cand.at[: -dy, :].set(INVALID)
            if dx > 0:
                cand = cand.at[:, w - dx :].set(INVALID)
            elif dx < 0:
                cand = cand.at[:, : -dx].set(INVALID)
            cvalid = cand >= 0
            if own_ch is not None:
                # composite: a pixel's prediction may only come from its OWNER
                cvalid = cvalid & (cdat[own_ch] == own_f)
            ungated = cvalid
            if not pre_gated:
                gate = cdat[conf_ch] if conf_ch is not None else conf_threshold
                cvalid = (
                    cvalid
                    & (cdat[sm.CONF] >= gate)
                    & (time - cdat[sm.LAST_T] <= time_delta)
                    & (cdat[sm.LAST_T] <= max_time)
                )
            cpx, cpy, cpz = cdat[sm.PX], cdat[sm.PY], cdat[sm.PZ]
            cnx, cny, cnz = cdat[sm.NX], cdat[sm.NY], cdat[sm.NZ]
            crad = cdat[sm.RADIUS]
            # ray-plane intersection: t = dot(p, n) / dot(l, n); hit = t * l
            ln = l0 * cnx + l1 * cny + l2 * cnz
            pn = cpx * cnx + cpy * cny + cpz * cnz
            t = pn / jnp.where(jnp.abs(ln) > 1e-12, ln, 1e-12)
            hx, hy, hz = t * l0, t * l1, t * l2
            d2 = (hx - cpx) ** 2 + (hy - cpy) ** 2 + (hz - cpz) ** 2
            disk = (d2 <= crad * crad) & (hz > 0)
            hit = cvalid & disk
            closer = hit & (hz < best_z)
            best_z = jnp.where(closer, hz, best_z)
            best_idx = jnp.where(closer, cand, best_idx)
            best_att = [
                jnp.where(closer, cdat[ch], acc)
                for ch, acc in zip(_WIN_CH, best_att)
            ]
            if with_ungated_depth:
                hit_u = ungated & disk
                best_zu = jnp.where(hit_u & (hz < best_zu), hz, best_zu)

    valid = best_idx >= 0
    win = dict(zip(_WIN_CH, best_att))

    def g(ch):
        return jnp.where(valid, win[ch], 0.0)

    # vertex = corrected position along the pixel ray (combo_splat.frag:
    # vertexConf.xyz is re-derived from gl_FragCoord and the corrected depth)
    zc = jnp.where(valid, best_z, 0.0)
    vx = lx * zc
    vy = ly * zc
    color = jnp.stack([g(sm.CR), g(sm.CG), g(sm.CB)], axis=-1)
    vertex_conf = jnp.stack([vx, vy, zc, g(sm.CONF)], axis=-1)
    normal_rad = jnp.stack([g(sm.NX), g(sm.NY), g(sm.NZ), g(sm.RADIUS)], axis=-1)
    tmap = jnp.where(valid, win[sm.INIT_T], 0.0)
    pred = PredictedMaps(
        color=color,
        vertex_conf=vertex_conf,
        normal_rad=normal_rad,
        time=tmap.astype(jnp.int32),
        valid=valid,
    )
    if with_ungated_depth:
        return pred, jnp.where(best_zu < _BIG, best_zu, 0.0)
    return pred


def splat_depth(
    smap: sm.SurfelMap,
    pose: jnp.ndarray,
    cam: CameraModel,
    conf_threshold,
    time,
    max_time,
    time_delta,
    max_depth: float,
    window: int = 5,
) -> jnp.ndarray:
    """Depth-only splat (ModelProjection::synthesizeDepth, :275-335)."""
    pred = splat_predict(
        smap, pose, cam, conf_threshold, time, max_time, time_delta, max_depth, window
    )
    return pred.vertex_conf[..., 2]
