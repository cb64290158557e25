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


# Packed depth-test key: 11 bits of log-quantized depth + 20 bits of surfel id
# in one int32. GL's f32 depth test (index_map.vert) needs TWO scatter passes
# plus a winner gather on TPU (min depth, then min id among exact-depth ties);
# one packed scatter-min is ~3x cheaper and still deterministic. Quantization:
# 2048 log2 levels over [1/16 m, 16 m] = 256 levels/octave = 0.27% relative
# depth resolution (2.7 mm at 1 m) — ties within one step resolve to the
# lowest id. All downstream consumers (association gates at >= 1 cm, the
# ray-disk splat resolve which re-derives exact depth from the winning
# candidates) are insensitive at this scale.
_ID_BITS = 20
_ZQ_LEVELS = 2048
_KEY_INVALID = jnp.int32(2**31 - 1)


def _pack_depth_id(z, ids, valid):
    # top bin reserved (clip to _ZQ_LEVELS - 2): geometry beyond 16 m would
    # otherwise all collapse into one bin where the max (zq, id) pair equals
    # _KEY_INVALID, making that surfel unable to win any pixel (viewer paths
    # render with max_depth up to 50 m)
    zq = (jnp.log2(jnp.maximum(z, 1e-6)) + 4.0) * (_ZQ_LEVELS / 8.0)
    zq = jnp.clip(zq.astype(jnp.int32), 0, _ZQ_LEVELS - 2)
    return jnp.where(valid, (zq << _ID_BITS) | ids, _KEY_INVALID)


def _zmin_scatter(u, v, z, valid, h: int, w: int):
    """Front-most valid surfel per pixel. Returns (index [H,W] or -1, zmin).

    zmin is the dequantized winning depth (0.27% relative) — no consumer in
    this codebase uses it for sub-centimetre tests.
    """
    n = z.shape[0]
    assert n <= (1 << _ID_BITS), "surfel bucket exceeds packed id range"
    pix = jnp.where(valid, v * w + u, h * w)  # invalid -> scratch bin
    ids = jnp.arange(n, dtype=jnp.int32)
    key = _pack_depth_id(z, ids, valid)
    kmin = jnp.full((h * w,), _KEY_INVALID).at[pix].min(key, mode="drop")
    won = kmin != _KEY_INVALID
    idx = jnp.where(won, kmin & ((1 << _ID_BITS) - 1), INVALID)
    zmin = jnp.where(
        won,
        jnp.exp2((kmin >> _ID_BITS).astype(jnp.float32) * (8.0 / _ZQ_LEVELS) - 4.0),
        _BIG,
    )
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
            ungated = cvalid
            if not pre_gated:
                cvalid = (
                    cvalid
                    & (cdat[sm.CONF] >= conf_threshold)
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
