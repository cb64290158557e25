"""Top-level engine: the per-frame SLAM pipeline.

TPU counterpart of reference Core/MultiMotionFusion.{h,cpp}. This round covers
the single-model ("-static", ElasticFusion-style) path of processFrame
(MultiMotionFusion.cpp:207-854): upload -> depth filter -> (first frame)
initialise -> track -> fuse -> clean -> predict -> pose logging. Multi-model
segmentation/spawning and the sparse keypoint pipeline layer on top in later
stages (SURVEY.md §7 stages 4-6).

Performance architecture (this is where the TPU build departs hardest from
the reference's per-stage GPU passes + per-iteration host readbacks):
- the ENTIRE per-frame pipeline is ONE jitted program (`_frame_step`); the
  reference crosses the host/device boundary hundreds of times per frame
  (SURVEY.md §3.2);
- engine state (surfel map, pose, prediction images, pose log) lives on
  device across frames; the host loop only uploads the new frame and enqueues
  the next step, so successive frames pipeline without round-trip stalls;
- per-frame scalars (errors, counts) come back as one small stats vector and
  are fetched lazily.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimotionfusion_tpu.config import CameraModel, EngineConfig, OdometryConfig
from multimotionfusion_tpu.io.frame import FrameData
from multimotionfusion_tpu.model import ferns as ferns_mod
from multimotionfusion_tpu.model import fusion, loop_closure, surfel_map as sm
from multimotionfusion_tpu.model.fillin import FilledMaps, fill_in
from multimotionfusion_tpu.model.model import Model, _bucket_for
from multimotionfusion_tpu.odometry import levels as lv
from multimotionfusion_tpu.odometry import rgbd
from multimotionfusion_tpu.ops import image as imops
from multimotionfusion_tpu.ops import maps as mapops
from multimotionfusion_tpu.ops import rasterize
from multimotionfusion_tpu.ops import ransac as ransac_ops
from multimotionfusion_tpu.tracking import superpoint, tracker
from multimotionfusion_tpu.utils import se3

# stat vector slots returned by the fused frame step
STAT_ICP_ERROR, STAT_ICP_COUNT, STAT_RGB_ERROR, STAT_RGB_COUNT, STAT_SURFELS, STAT_HWM = range(6)


class GlobalState(NamedTuple):
    """Device-resident single-model engine state."""

    smap: sm.SurfelMap
    pose: jnp.ndarray  # [4,4]
    prev_pose: jnp.ndarray  # pose one frame earlier (fusion weighting)
    filled: FilledMaps  # prediction for the next frame's tracking
    last_intensity_coarse: jnp.ndarray  # previous frame coarse intensity (SO3)
    tracks: tracker.TrackTable  # keypoint track table (sparse pipeline)
    rng: jnp.ndarray  # PRNG key (RANSAC sampling)
    ferns: ferns_mod.FernDB  # loop-closure keyframe database
    bad_track_count: jnp.ndarray  # [] int32 consecutive bad-covariance frames
    lost: jnp.ndarray  # [] bool — relocalisation mode engaged
    pose_matches: loop_closure.MatchLog  # loop-closure PoseMatch records


def _fern_cam(cam: CameraModel, factor: int) -> CameraModel:
    return CameraModel(
        width=cam.width // factor, height=cam.height // factor,
        fx=cam.fx / factor, fy=cam.fy / factor,
        cx=cam.cx / factor, cy=cam.cy / factor,
    )


_FERN_ODOM = OdometryConfig(
    num_pyr=2, iterations=(10, 5), so3_prealign=False,
    mask_icp=False, mask_rgb=False, min_grad_magnitudes=(5.0, 3.0),
)


def _ferns_update(
    state_ferns, rgb, vmap_f, nmap_f, pose, time, lost, cam: CameraModel,
    cfg: EngineConfig,
):
    """Per-frame fern maintenance + relocalisation (reloc mode).

    == the closeLoops/relocalisation path (MultiMotionFusion.cpp:629-695):
    insert dissimilar keyframes; when tracking is lost, retrieve + align
    against the closest keyframe and adopt its pose if all gates pass.
    """
    f = cfg.ferns.factor
    cam_s = _fern_cam(cam, f)
    rgb_s, vmap_s, nmap_s = ferns_mod.downsample_frame(rgb, vmap_f, nmap_f, f)
    depth_s = vmap_s[..., 2]

    def do_reloc(_):
        r = ferns_mod.find_frame(
            state_ferns, rgb_s, vmap_s, nmap_s, depth_s, cam_s, _FERN_ODOM,
            photo_thresh=cfg.ferns.photo_thresh,
        )
        return r.pose, r.ok

    def no_reloc(_):
        return pose, jnp.zeros((), bool)

    # the retrieval + alignment only runs while lost (lax.cond skips it on
    # healthy frames; the reference gates the same way, :679-686)
    reloc_pose, reloc_ok = jax.lax.cond(lost, do_reloc, no_reloc, None)
    relocalised = lost & reloc_ok
    pose = jnp.where(relocalised, reloc_pose, pose)

    # only insert while tracking is healthy (the reference also skips fern
    # insertion when lost: fusion path is skipped entirely, :791)
    db, _ = ferns_mod.add_frame(
        state_ferns, rgb_s, vmap_s, nmap_s, pose, time,
        cfg.ferns.encoding_threshold
    )
    db = jax.tree.map(
        lambda new, old: jnp.where(lost, old, new), db, state_ferns
    )
    return db, pose, relocalised


def _detect_keypoints(intensity, cfg: EngineConfig, sp_params):
    kcfg = cfg.keypoints
    if cfg.odom_init != "kp" and not cfg.enable_multi_model:
        return None
    if kcfg.detector == "superpoint":
        return superpoint.superpoint_detect(
            sp_params, intensity, kcfg.max_keypoints,
            kcfg.detect_threshold, kcfg.nms_radius,
        )
    return superpoint.patch_detect(
        intensity, kcfg.max_keypoints, nms_radius=kcfg.nms_radius
    )


def _detect_keypoints_level(intensity_pyr, lvl: int, cfg: EngineConfig,
                            sp_params):
    """Detect on pyramid level `lvl`, coordinates returned at FULL resolution.

    == the reference's per-level SuperPoint runs (MultiMotionFusion.cpp:
    223-237: the rgb frame is resized by >> lvl per used tracker level).
    Storing xy in full-res units (pixel-centre mapping u_full =
    (u_lvl + 0.5) * 2^lvl - 0.5) keeps every downstream consumer —
    depth lookup, mask association, velocity projection — level-agnostic:
    the 3D point is the same, only detection granularity changes."""
    kps = _detect_keypoints(intensity_pyr[lvl], cfg, sp_params)
    if kps is not None and lvl > 0:
        s = jnp.float32(1 << lvl)
        kps = kps._replace(xy=(kps.xy + 0.5) * s - 0.5)
    return kps


def _yuv_to_rgb(y_u8, uv_u8):
    """Reconstruct RGB from the upload wire format (see upload()).

    Luma uses the engine's own intensity weights (rgb_to_intensity), so the
    reconstructed image's intensity equals the transmitted luma EXACTLY (G is
    solved from L, R, B) — the odometry's photometric term sees no chroma
    loss; only stored map colours carry the half-res chroma approximation.
    """
    L = y_u8.astype(jnp.float32)
    uv = uv_u8.astype(jnp.float32)
    up = jnp.repeat(jnp.repeat(uv, 2, axis=-2), 2, axis=-1)
    R = jnp.clip(L + 2.0 * (up[0] - 128.0), 0.0, 255.0)
    B = jnp.clip(L + 2.0 * (up[1] - 128.0), 0.0, 255.0)
    G = jnp.clip((L - 0.114 * R - 0.587 * B) / 0.299, 0.0, 255.0)
    return jnp.stack([R, G, B], axis=-1)


def _frame_inputs(rgb_u8, depth_raw, cam: CameraModel, cfg: EngineConfig, uv=None):
    if uv is not None:
        rgb = _yuv_to_rgb(rgb_u8, uv)
    else:
        rgb = rgb_u8.astype(jnp.float32)
    if jnp.issubdtype(depth_raw.dtype, jnp.integer):
        # depth uploaded as raw sensor millimetres (uint16): 3x fewer bytes
        # over the host->device link than f32 metres; convert on device
        depth_raw = depth_raw.astype(jnp.float32) * 0.001
    depth_filt = imops.bilateral_depth_filter(depth_raw)
    vmap_raw = mapops.create_vmap(depth_raw, cam, cfg.surfels.depth_cutoff)
    vmap_f = mapops.create_vmap(depth_filt, cam, cfg.surfels.depth_cutoff)
    nmap_f = mapops.create_nmap(vmap_f)
    return rgb, depth_filt, vmap_raw, vmap_f, nmap_f


def _predict(smap, pose, rgb, depth_filt, vmap_f, nmap_f, time, cam, cfg, bucket, lost=False):
    scfg = cfg.surfels
    pred = rasterize.splat_predict(
        smap.bucketed(bucket), pose, cam, scfg.conf_threshold,
        jnp.where(jnp.asarray(lost), 0, time), time,
        scfg.time_delta, scfg.depth_cutoff, scfg.splat_footprint,
    )
    conf = sm.pixel_confidence(cam, 1.0)
    rad = sm.radius_from_depth(vmap_f[..., 2], nmap_f[..., 2], cam)
    filled = fill_in(
        pred, rgb, vmap_f, nmap_f, conf, rad, cfg.frame_to_frame_rgb
    )
    return pred, filled


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def _init_step(rgb_u8, depth_raw, pose0, time, sp_params, cam: CameraModel, cfg: EngineConfig, uv=None):
    """First frame: initialise the map + first prediction (processFrame tick==1)."""
    rgb, depth_filt, vmap_raw, vmap_f, nmap_f = _frame_inputs(rgb_u8, depth_raw, cam, cfg, uv)
    fs = sm.compute_frame_surfels(
        rgb, vmap_raw, vmap_f, nmap_f, cam, time, cfg.surfels.depth_cutoff, 1.0
    )
    smap = sm.init_from_frame(fs, cfg.surfels.max_surfels)
    bucket = cfg.surfels.max_surfels  # only used once; no need to specialise
    _, filled = _predict(smap, pose0, rgb, depth_filt, vmap_f, nmap_f, time, cam, cfg, bucket)
    intensity = imops.rgb_to_intensity(rgb)
    int_pyr = imops.build_pyramid(intensity, cfg.odometry.num_pyr)
    coarse = int_pyr[cfg.odometry.num_pyr - 1]
    # seed the keypoint track table (initGlobalTracks, MultiMotionFusion.cpp:296)
    kcfg = cfg.keypoints
    tracks = tracker.empty(kcfg.max_tracks, kcfg.track_history, kcfg.desc_dim)
    kps = _detect_keypoints_level(int_pyr, cfg.odometry.init_lvl, cfg, sp_params)
    if kps is not None:
        tracks = tracker.add_keypoints(tracks, kps, depth_filt, time, cam, kcfg)
    # second tracker at segm_lvl (MultiMotionFusion.cpp:83-87) — seeded here
    # so frame 2's segmentation already has velocity pairs
    tracks_segm = None
    if cfg.enable_multi_model and cfg.odometry.segm_lvl != cfg.odometry.init_lvl:
        tracks_segm = tracker.empty(
            kcfg.max_tracks, kcfg.track_history, kcfg.desc_dim
        )
        kps_s = _detect_keypoints_level(
            int_pyr, cfg.odometry.segm_lvl, cfg, sp_params
        )
        tracks_segm = tracker.add_keypoints(
            tracks_segm, kps_s, depth_filt, time, cam, kcfg
        )
    stats = jnp.zeros((6,), jnp.float32)
    stats = stats.at[STAT_SURFELS].set(smap.alive_count().astype(jnp.float32))
    stats = stats.at[STAT_HWM].set(smap.count.astype(jnp.float32))
    rng = jax.random.PRNGKey(cfg.seed)
    fdb = ferns_mod.create(cfg.ferns, cam, seed=cfg.seed)
    if cfg.reloc_mode or cfg.close_loops:
        fdb, _ = ferns_mod.add_frame(
            fdb,
            *ferns_mod.downsample_frame(rgb, vmap_f, nmap_f, cfg.ferns.factor),
            pose0, time, cfg.ferns.encoding_threshold,
        )
    return GlobalState(
        smap, pose0, pose0, filled, coarse, tracks, rng, fdb,
        jnp.zeros((), jnp.int32), jnp.zeros((), bool),
        loop_closure.empty_log(),
    ), stats, tracks_segm


def _compact_pred(time, scfg):
    """Periodic-repack predicate for fusion.clean (see SurfelConfig.compact_every)."""
    k = scfg.compact_every
    if k <= 0:
        return False
    if k == 1:
        return True
    return jnp.asarray(time, jnp.int32) % k == 0


def _frame_core(
    state: GlobalState,
    rgb_u8,
    depth_raw,
    mask,
    time,
    weight_multiplier,
    sp_params,
    cam: CameraModel,
    cfg: EngineConfig,
    bucket_fuse: int,
    bucket_pred: int,
    uv=None,
):
    """Track -> fuse -> clean -> predict, one XLA program (tick > 1)."""
    scfg = cfg.surfels
    rgb, depth_filt, vmap_raw, vmap_f, nmap_f = _frame_inputs(rgb_u8, depth_raw, cam, cfg, uv)
    frame_pyr = lv.build_frame_pyramids(depth_filt, rgb, mask, cfg.odometry)

    # ---- sparse keypoint pipeline (SuperPoint/patch -> tracks -> RANSAC) --
    pose = state.pose
    tracks = state.tracks
    rng = state.rng
    kps = _detect_keypoints_level(
        frame_pyr.intensity, cfg.odometry.init_lvl, cfg, sp_params
    )
    if kps is not None:
        kcfg = cfg.keypoints
        tracks = tracker.add_keypoints(tracks, kps, depth_filt, time, cam, kcfg)
        tracks = tracker.prune(tracks, time, kcfg)
    if cfg.odom_init == "kp" and kps is not None:
        # pose init from the rigid fit between the last two keypoint sets
        # (Model::getLastTrackTransform; Tnew = pose * T_rel for the global
        # model, MultiMotionFusion.cpp:320-335)
        p0, p1, pair_valid = tracker.last_pair(tracks, time)
        rng, sub = jax.random.split(rng)
        res = ransac_ops.ransac_fit(sub, p0, p1, pair_valid, cfg.ransac)
        # accept the seed only when the consensus is trustworthy — the
        # reference applies the fit unconditionally (it only warns on zero
        # inliers, MultiMotionFusion.cpp:324-327); a bad seed costs more than
        # no seed because the dense solver must claw it back
        good = (
            res.ok
            & (res.num_inliers >= 24)
            & (res.error < 0.008)
            & jnp.all(jnp.isfinite(res.transform))
            & (jnp.linalg.norm(res.transform[:3, 3]) < 0.03)  # inter-frame sanity
        )
        T_rel = jnp.where(good, res.transform, jnp.eye(4, dtype=jnp.float32))
        pose = pose @ T_rel
        seed_ok = good
    if cfg.icp_refine or cfg.odom_init != "tf":
        # prediction maps were rendered at the PREVIOUS pose (state.pose),
        # which stays the solver's T_prev; a kp-initialised pose enters as
        # the initial increment (see get_incremental_transformation)
        levels = lv.build_level_data(
            frame_pyr,
            state.filled.vertex_conf[..., :3],
            state.filled.normal_rad[..., :3],
            imops.rgb_to_intensity(state.filled.color),
            cam, cfg.odometry, 0,
        )
        seeded = cfg.odom_init == "kp" and kps is not None
        odo = rgbd.get_incremental_transformation(
            state.pose, levels, state.last_intensity_coarse, cfg.odometry,
            cam, 0, T_init=pose if seeded else None, seeded=seeded,
            seed_valid=seed_ok if seeded else None,
        )
        pose = odo.pose
    else:
        odo = None

    # ---- tracking-lost detection + fern relocalisation (reloc mode) -------
    # (MultiMotionFusion.cpp:629-695: covariance diag > 1e-4 for > 10
    # consecutive frames => lost; a fern match that passes all gates recovers)
    bad_count = state.bad_track_count
    lost = state.lost
    if cfg.reloc_mode and odo is not None:
        cov = jnp.linalg.inv(
            odo.A + jnp.eye(6, dtype=jnp.float32) * 1e-12
        )
        bad = (jnp.max(jnp.diagonal(cov)) > 1e-4) | (odo.icp_count < 100)
        bad_count = jnp.where(bad, bad_count + 1, 0)
        lost = lost | (bad_count > 10)
        ferns_db, pose, relocalised = _ferns_update(
            state.ferns, rgb, vmap_f, nmap_f, pose, time, lost, cam, cfg
        )
        lost = lost & ~relocalised
        bad_count = jnp.where(relocalised, 0, bad_count)
    else:
        ferns_db = state.ferns

    # ---- global loop closure (closeLoops, MultiMotionFusion.cpp:679-789) --
    # fern retrieval + embedded-deformation map correction, BEFORE fusion so
    # the corrected map/pose receive this frame's data (reference order:
    # closeLoops :679, fuse :791). Off by default for fork parity (§5.4).
    smap_in = state.smap
    match_log = state.pose_matches
    if cfg.close_loops:
        f = cfg.ferns.factor
        cam_s = _fern_cam(cam, f)
        rgb_s, vmap_s, nmap_s = ferns_mod.downsample_frame(rgb, vmap_f, nmap_f, f)
        smap_in, pose, match = loop_closure.attempt(
            ferns_db, smap_in, pose, rgb_s, vmap_s, nmap_s, time, cam_s, cfg
        )
        match_log = loop_closure.log_append(match_log, match)
        if not cfg.reloc_mode:  # reloc mode already inserts keyframes above
            ferns_db, _ = ferns_mod.add_frame(
                ferns_db, rgb_s, vmap_s, nmap_s, pose, time,
                cfg.ferns.encoding_threshold
            )

    # ---- fusion weight (Model::computeFusionWeight, Model.cpp:876-891) ----
    diff = pose @ se3.inverse_T(state.prev_pose)
    motion = jnp.maximum(
        jnp.linalg.norm(diff[:3, 3]), jnp.linalg.norm(se3.so3_log(diff[:3, :3]))
    )
    weighting = (
        jnp.maximum(1.0 - jnp.minimum(motion, 0.01) / 0.01, 0.5) * weight_multiplier
    )

    # ---- fuse + clean ------------------------------------------------------
    sub = smap_in.bucketed(bucket_fuse)
    fs = sm.compute_frame_surfels(
        rgb, vmap_raw, vmap_f, nmap_f, cam, time, scfg.depth_cutoff, weighting
    )
    im = rasterize.predict_indices(
        sub, pose, cam, time, scfg.time_delta, scfg.depth_cutoff
    )
    # winner-attribute images are shared by fuse, clean AND the splat resolve
    # below — one ~1.4 ms gather instead of three
    attrs = rasterize.gather_attr_images(im.data_local, im.index)
    fused = fusion.fuse(sub, fs, im, mask, 0, pose, cam, time, scfg, attrs=attrs)
    cleaned = fusion.clean(
        fused, im, depth_filt, mask, 0, pose, cam,
        time, scfg.time_delta, scfg.conf_threshold, scfg, attrs=attrs,
        compact=_compact_pred(time, scfg),
    )
    if cfg.reloc_mode:
        # fusion is skipped while lost (MultiMotionFusion.cpp:791)
        cleaned = sm.SurfelMap(
            data=jnp.where(lost, sub.data, cleaned.data),
            count=jnp.where(lost, sub.count, cleaned.count),
        )
    data = smap_in.data.at[:, :bucket_fuse].set(cleaned.data)
    smap = sm.SurfelMap(data=data, count=cleaned.count)

    # ---- prediction for the next frame ------------------------------------
    # reuses the shared index map: one z-min scatter pass per frame total
    # (splat gates applied per candidate inside the resolve)
    pred = rasterize.splat_resolve(
        im, cam, scfg.conf_threshold, time, time, scfg.time_delta,
        scfg.splat_footprint, attrs=attrs,
    )
    conf_img = sm.pixel_confidence(cam, 1.0)
    rad_img = sm.radius_from_depth(vmap_f[..., 2], nmap_f[..., 2], cam)
    filled = fill_in(
        pred, rgb, vmap_f, nmap_f, conf_img, rad_img, cfg.frame_to_frame_rgb
    )

    coarse = frame_pyr.intensity[cfg.odometry.num_pyr - 1]
    stats = jnp.zeros((6,), jnp.float32)
    if odo is not None:
        stats = stats.at[STAT_ICP_ERROR].set(odo.icp_error)
        stats = stats.at[STAT_ICP_COUNT].set(odo.icp_count)
        stats = stats.at[STAT_RGB_ERROR].set(odo.rgb_error)
        stats = stats.at[STAT_RGB_COUNT].set(odo.rgb_count)
    stats = stats.at[STAT_SURFELS].set(smap.alive_count().astype(jnp.float32))
    stats = stats.at[STAT_HWM].set(smap.count.astype(jnp.float32))
    return GlobalState(
        smap, pose, state.pose, filled, coarse, tracks, rng, ferns_db,
        bad_count, lost, match_log,
    ), stats


@functools.partial(
    jax.jit, static_argnames=("cam", "cfg", "bucket_fuse", "bucket_pred")
)
def _frame_step(state, rgb_u8, depth_raw, mask, time, weight_multiplier,
                sp_params, cam: CameraModel, cfg: EngineConfig,
                bucket_fuse: int, bucket_pred: int, uv=None):
    return _frame_core(state, rgb_u8, depth_raw, mask, time,
                       weight_multiplier, sp_params, cam, cfg,
                       bucket_fuse, bucket_pred, uv)


@functools.partial(
    jax.jit, static_argnames=("cam", "cfg", "bucket_fuse", "bucket_pred")
)
def _frame_steps_batch(state, rgbs, depths, time0, weight_multiplier,
                       sp_params, cam: CameraModel, cfg: EngineConfig,
                       bucket_fuse: int, bucket_pred: int, uvs=None):
    """k frames per dispatch via lax.scan over the batch.

    On a remote (tunnelled) backend every executable launch costs a host
    round-trip comparable to the device step itself; scanning k frames inside
    ONE executable amortises it k-fold. Static mode only takes per-frame host
    input (no masks, no gt), so the scan is semantically identical to k
    single steps.

    Carry slimming: lax.scan double-buffers its carry, so every iteration
    pays a copy of whatever rides in it. The surfel array enters at BUCKET
    size (the full-capacity array is written back once after the scan) and
    the fern keyframe store is hoisted out entirely when reloc/loop-closure
    is off (it is pass-through then) — together ~150 MB that would otherwise
    be copied per frame (~3 ms/frame measured)."""
    zero_mask = jnp.zeros((cam.height, cam.width), jnp.int32)

    def body(st, inp):
        rgb_u8, depth_raw, uv, dt = inp
        st2, stats = _frame_core(
            st, rgb_u8, depth_raw, zero_mask, time0 + dt, weight_multiplier,
            sp_params, cam, cfg, bucket_fuse, bucket_pred, uv,
        )
        return st2, (stats, st2.pose)

    full_data = state.smap.data
    hoist_ferns = not (cfg.reloc_mode or cfg.close_loops)
    real_ferns = state.ferns
    carry = state._replace(smap=state.smap.bucketed(bucket_fuse))
    if hoist_ferns:
        carry = carry._replace(ferns=ferns_mod.stub(real_ferns))

    k = rgbs.shape[0]
    xs = (rgbs, depths, uvs, jnp.arange(k, dtype=jnp.int32))
    if uvs is None:
        def body_nouv(st, inp):
            rgb_u8, depth_raw, dt = inp
            return body(st, (rgb_u8, depth_raw, None, dt))
        carry, (stats, poses) = jax.lax.scan(
            body_nouv, carry, (rgbs, depths, jnp.arange(k, dtype=jnp.int32))
        )
    else:
        carry, (stats, poses) = jax.lax.scan(body, carry, xs)
    state = carry._replace(
        smap=sm.SurfelMap(
            data=full_data.at[:, :bucket_fuse].set(carry.smap.data),
            count=carry.smap.count,
        )
    )
    if hoist_ferns:
        state = state._replace(ferns=real_ferns)
    return state, stats, poses


def dataclasses_asdict_safe(obj):
    import dataclasses

    return dataclasses.asdict(obj)


def _pack_yuv420(rgb: np.ndarray):
    """uint8 RGB -> (Y [H,W] u8, UV [2,H/2,W/2] u8) wire format.

    Y is the engine's intensity (rgb_to_intensity weights), so tracking sees
    it losslessly; chroma (R-Y, B-Y at half scale) rides at quarter density.
    Cuts the per-frame host->device colour payload roughly in half.
    """
    f = rgb.astype(np.float32)
    L = f[..., 0] * 0.114 + f[..., 1] * 0.299 + f[..., 2] * 0.587
    U = (f[..., 0] - L) * 0.5 + 128.0
    V = (f[..., 2] - L) * 0.5 + 128.0
    h, w = L.shape
    uv = np.stack([U, V])
    uv = uv.reshape(2, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    return (
        np.clip(np.floor(L), 0, 255).astype(np.uint8),
        np.clip(np.rint(uv), 0, 255).astype(np.uint8),
    )


def _normalize_cfg(cfg: EngineConfig) -> EngineConfig:
    """Resolve cross-field config implications."""
    import dataclasses

    if (
        cfg.enable_multi_model
        and cfg.segmentation.mode == "crf"
        and not cfg.odometry.error_images
    ):
        # legacy CoFusion CRF consumes per-model ICP error images
        # (Segmentation.cpp:212-332) — turn on the odometry error pass
        cfg = dataclasses.replace(
            cfg, odometry=dataclasses.replace(cfg.odometry, error_images=True)
        )
    return cfg


class MultiMotionFusionTPU:
    """Engine facade (reference class MultiMotionFusion, Core/MultiMotionFusion.h:54-)."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = _normalize_cfg(cfg)
        cfg = self.cfg
        self.cam = cfg.camera
        self.tick = 1
        # SuperPoint weights (TorchScript) if configured; zero-size placeholder
        # keeps the jit arg pytree stable when the patch detector is active
        if cfg.keypoints.detector == "superpoint" and cfg.keypoints.weights_path:
            from multimotionfusion_tpu.tracking.superpoint import load_torchscript

            self.sp_params = load_torchscript(cfg.keypoints.weights_path)
        else:
            self.sp_params = jnp.zeros((0,), jnp.float32)
        self.time_delta = cfg.surfels.time_delta
        self.models: List[Model] = [Model(0, cfg)]
        self.state: Optional[GlobalState] = None
        self.mstate = None  # MultiState when enable_multi_model
        self._obj_pose_dev: List[tuple] = []  # (ts, obj_poses, obj_active)
        self._spawn_dev: List[tuple] = []  # (ts, spawn?, slot, refine_T)
        self.lost = False
        self.stats: Dict[str, float] = {}
        self._stats_dev: List[jnp.ndarray] = []  # per-frame device stats vectors
        self._pose_dev: List[tuple] = []  # (timestamp, device pose)
        self._hwm = 0
        self._hwm_tick = 0  # tick at which _hwm was read
        self._growth_rate = 4096  # measured appends/frame (see _buckets)
        self._bucket = 0  # sticky work bucket (see _buckets)
        self._hwm_obj = 0  # object-slot surfel high-water mark (max slot)
        self._hwm_obj_tick = 0
        self._growth_obj = 2048
        self._bucket_obj = 0  # sticky OBJECT work bucket (see _buckets)
        self._zero_mask = None  # cached device-side all-zeros mask
        self._upload_pool = None  # single-thread uploader (see upload())
        self._last_args = None  # (kind, frame arrays) for bucket prewarming
        self._prewarmed: set = set()  # bucket rungs already compiled ahead
        self.last_mask = None  # latest segmentation (device; '-es' export)
        self._mask_dev = None  # (stamps, [k, H, W]) masks of the last batch
        # model lifecycle listener registry (reference Core/Callbacks.h
        # CallbackBuffer; addNewModelListener/addInactiveModelListener,
        # MultiMotionFusion.h:300-303)
        self._listeners: Dict[str, list] = {}
        self._event_cursor = 0  # next _obj_pose_dev entry to resolve
        self._active_last: Optional[np.ndarray] = None

    @property
    def global_model(self) -> Model:
        # kept for API parity; surfel map state lives in self.state
        # (static mode) or self.mstate.smap (multi-model mode)
        gm = self.models[0]
        if self.state is not None:
            gm.smap = self.state.smap
            gm.pose = self.state.pose
            gm.hwm = int(self.state.smap.count)
        elif self.mstate is not None:
            gm.smap = self.mstate.smap
            gm.pose = self.mstate.pose
            gm.hwm = int(self.mstate.smap.count)
        gm.pose_log = self._expand_pose_log()
        return gm

    def _expand_pose_log(self):
        out = []
        for ts, p in self._pose_dev:
            if isinstance(ts, list):  # batched entry: [k] stamps, [k,4,4] poses
                arr = np.asarray(p)
                out.extend((t, arr[i]) for i, t in enumerate(ts))
            else:
                out.append((ts, np.asarray(p)))
        return out

    def _expand_lifecycle_logs(self):
        """Expand batched (ts is a list) entries of the object-pose and spawn
        logs into per-frame numpy entries, in place.

        Entries before the event cursor are already per-frame (they were
        expanded during a previous drain), so expansion never renumbers what
        the cursor has consumed."""

        def expand(entries):
            out = []
            for e in entries:
                if isinstance(e[0], list):
                    arrs = [np.asarray(x) for x in e[1:]]
                    out.extend(
                        (t, *(a[i] for a in arrs)) for i, t in enumerate(e[0])
                    )
                else:
                    out.append(e)
            return out

        self._obj_pose_dev = expand(self._obj_pose_dev)
        self._spawn_dev = expand(self._spawn_dev)

    def _buckets(self, k_ahead: int = 1):
        """Pick work buckets from a (possibly stale) high-water mark.

        The per-frame in-graph compaction (fusion.clean(compact=True)) keeps
        ``count`` equal to the LIVE population, so the bucket tracks the real
        map size. Growth between device syncs is extrapolated from the
        MEASURED per-frame growth rate (x4 safety margin); when the
        extrapolation would out-grow the current bucket, the true count is
        first re-read from the device (one small sync) — so buckets grow only
        when the map actually grows. Shrinking is allowed too, but only on a
        fresh device read and only by whole rungs with a 2x hysteresis (the
        initial frame seeds ~300k surfels of which most die at the unstable
        grace deadline; without shrink the whole session would pay for that
        transient). Intra-frame fuse appends (~10-15k before clean reclaims
        them) ride inside a fixed headroom floor. If a burst out-grows the
        margin within one sync interval, appends beyond the bucket are
        dropped for those frames (the reference likewise drops surfels at its
        hard capacity, Model.cpp:116-126)."""
        cap = self.cfg.surfels.max_surfels
        headroom = 24576  # intra-frame append transient (reclaimed by clean)
        margin = max(4 * self._growth_rate, 2048)
        est = self._hwm + (self.tick + k_ahead - self._hwm_tick) * margin
        if self._bucket == 0:
            self._bucket = _bucket_for(est + headroom, cap)
        stale = self.tick - self._hwm_tick
        if (est + headroom > self._bucket or stale >= 64) and self.state is not None:
            new_hwm = int(self.state.smap.count)  # device sync (rare)
            dt = max(stale, 1)
            self._growth_rate = max((new_hwm - self._hwm) // dt, 64)
            self._hwm = new_hwm
            self._hwm_tick = self.tick
            margin = max(4 * self._growth_rate, 2048)
            est = self._hwm + (k_ahead + 1) * margin
            ideal = _bucket_for(est + headroom, cap)
            if ideal * 2 <= self._bucket:
                self._bucket = ideal  # whole-rung shrink, 2x hysteresis
        if est + headroom > self._bucket:
            self._bucket = _bucket_for(est + headroom, cap)
        return self._bucket, self._bucket

    def _bucket_objects(self, k_ahead: int = 1) -> int:
        """Sticky work bucket for the OBJECT slot arrays (multi-model mode).

        Same high-water-mark scheme as _buckets, but over max(objects.count):
        every composite pass (index scatter, fuse, clean, render) walks
        n_slots x bucket_obj surfel slots, and real object models run 1-2
        orders of magnitude smaller than object_capacity — pricing the
        scatters at capacity wasted ~40% of the multi-model frame's scatter
        updates. A spawn can jump the count between device syncs; the floor
        (16k) plus the x4 growth margin absorbs it until the next sync (<=64
        frames), during which appends beyond the bucket are dropped exactly
        like the global path's burst note."""
        cap = self.cfg.object_capacity
        if self.mstate is None:
            return self._bucket_obj or _bucket_for(1, cap, floor=1 << 14)
        headroom = 4096
        margin = max(4 * self._growth_obj, 1024)
        est = self._hwm_obj + (self.tick + k_ahead - self._hwm_obj_tick) * margin
        if self._bucket_obj == 0:
            self._bucket_obj = _bucket_for(est + headroom, cap, floor=1 << 14)
        stale = self.tick - self._hwm_obj_tick
        if est + headroom > self._bucket_obj or stale >= 64:
            new_hwm = int(jnp.max(self.mstate.objects.count))  # rare sync
            dt = max(stale, 1)
            self._growth_obj = max((new_hwm - self._hwm_obj) // dt, 64)
            self._hwm_obj = new_hwm
            self._hwm_obj_tick = self.tick
            margin = max(4 * self._growth_obj, 1024)
            est = self._hwm_obj + (k_ahead + 1) * margin
            ideal = _bucket_for(est + headroom, cap, floor=1 << 14)
            if ideal * 2 <= self._bucket_obj:
                self._bucket_obj = ideal  # whole-rung shrink, 2x hysteresis
        if est + headroom > self._bucket_obj:
            self._bucket_obj = _bucket_for(est + headroom, cap, floor=1 << 14)
        return min(self._bucket_obj, cap)

    def _maybe_prewarm(self):
        """Compile the NEXT bucket rung in a background thread before the map
        grows into it, so rung crossings never stall the frame stream.

        A rung crossing recompiles the whole frame program — tens of seconds
        through a tunnelled backend, far beyond any frame budget (the
        reference never recompiles; this is the jit-cache equivalent of its
        fixed preallocation). Triggered once the growth extrapolation passes
        70% of the current bucket; the warming call replays the LAST frame's
        inputs at the next rung (result discarded), which both compiles and
        caches the exact (shapes, statics) variant the real stream will hit.
        Costs one extra device step per rung per session.
        """
        cap = self.cfg.surfels.max_surfels
        if (
            self._bucket >= cap
            or self._last_args is None
            or self.state is None
        ):
            return
        margin = max(4 * self._growth_rate, 2048)
        est = self._hwm + (self.tick + 1 - self._hwm_tick) * margin
        if est < 0.7 * self._bucket:
            return
        nxt = _bucket_for(self._bucket + 1, cap)
        if nxt <= self._bucket or nxt in self._prewarmed:
            return
        self._prewarmed.add(nxt)
        import threading

        kind, args = self._last_args
        state, mstate = self.state, self.mstate
        tick, sp, cam, cfg = self.tick, self.sp_params, self.cam, self.cfg
        bobj = self._bucket_obj or None  # prewarm at the CURRENT object rung

        def _go():
            try:
                if kind == "multi":
                    from multimotionfusion_tpu import engine_multi as em

                    rgb_u8, depth_raw, uv, mask = args
                    em.multi_frame_step(
                        mstate, rgb_u8, depth_raw, uv, tick, 1.0, sp, cam,
                        cfg, nxt, ext_mask=mask, bucket_obj=bobj,
                    )
                elif kind == "multi_batch":
                    from multimotionfusion_tpu import engine_multi as em

                    rgbs, depths, uvs = args
                    em.multi_frame_steps_batch(
                        mstate, rgbs, depths, uvs, tick, 1.0, sp, cam, cfg,
                        nxt, bucket_obj=bobj,
                    )
                elif kind == "batch":
                    rgbs, depths, uvs = args
                    _frame_steps_batch(
                        state, rgbs, depths, tick, 1.0, sp, cam, cfg, nxt,
                        nxt, uvs,
                    )
                else:
                    rgb_u8, depth_raw, mask, uv = args
                    _frame_step(
                        state, rgb_u8, depth_raw, mask, tick, 1.0, sp, cam,
                        cfg, nxt, nxt, uv,
                    )
            except Exception:
                pass  # a failed prewarm only costs the stall it tried to hide

        threading.Thread(target=_go, daemon=True, name="bucket-prewarm").start()

    def upload_batch(self, frames, background: bool = True):
        """Stage a batch of frames as stacked arrays (one transfer).

        No host-side repacking: depth rides in the reader's native dtype
        (u16 mm from sensors/logs, f32 m from synthetic sources) and colour
        as raw u8 — measured on the tunnelled TPU, transfer runs ~1 GB/s
        while numpy repacking costs ~10 ms/frame of host CPU, so minimising
        HOST work (not bytes) is what keeps the upload off the critical path.
        The background path drives the copy to completion (block_until_ready)
        so it genuinely overlaps with the in-flight device step instead of
        being performed lazily at next dispatch.
        """
        import numpy as _np

        def _put():
            deps = _np.stack([f.depth for f in frames])
            if self.cfg.upload_depth_mm and deps.dtype == _np.float32:
                # sensor-native u16 millimetres: 2x fewer bytes than f32
                # metres through the (bandwidth-limited) tunnel; the device
                # converts back (see _frame_inputs). 0.5 mm quantisation is
                # below every sensor's noise floor.
                deps = _np.clip(deps * 1000.0, 0, 65535).astype(_np.uint16)
            if self.cfg.upload_yuv420 and frames[0].rgb.dtype == _np.uint8:
                packed = [_pack_yuv420(f.rgb) for f in frames]
                out = jax.device_put(
                    (
                        _np.stack([p[0] for p in packed]),
                        deps,
                        _np.stack([p[1] for p in packed]),
                    )
                )
            else:
                rgbs = _np.stack([f.rgb for f in frames])
                out = jax.device_put((rgbs, deps))
            return jax.block_until_ready(out)

        if background:
            if self._upload_pool is None:
                import concurrent.futures

                self._upload_pool = concurrent.futures.ThreadPoolExecutor(1)
            return (list(frames), self._upload_pool.submit(_put))
        return (list(frames), _put())

    def process_frames(self, frames, weight_multiplier: float = 1.0):
        """Process several frames in ONE device dispatch (static mode).

        Accepts a list of FrameData or a handle from upload_batch(). Falls
        back to per-frame processing where per-frame host input is needed
        (first frame, multi-model mode, '-init tf' ground truth)."""
        if isinstance(frames, tuple):
            frames, staged = frames
        else:
            staged = None
        if (
            self.state is None
            or len(frames) == 1
            or self.cfg.odom_init == "tf"
            or (
                self.cfg.enable_multi_model
                and (
                    self.cfg.segmentation.mode == "precomputed"
                    or any(f.mask is not None for f in frames)
                )
            )
        ):
            # per-frame host input required (first frame, gt poses, external
            # masks): fall back to frame-at-a-time processing
            for f in frames:
                self.process_frame(f, weight_multiplier=weight_multiplier)
            return self.current_stats(sync=False)
        if staged is None:
            staged = self.upload_batch(frames, background=False)[1]
        arrs = staged.result() if hasattr(staged, "result") else staged
        rgbs, depths = arrs[0], arrs[1]
        uvs = arrs[2] if len(arrs) == 3 else None
        bucket_fuse, bucket_pred = self._buckets(k_ahead=len(frames))
        if self.cfg.enable_multi_model:
            from multimotionfusion_tpu import engine_multi as em

            (
                self.mstate, stats, poses, obj_poses, obj_active,
                spawns, slots, refine_Ts, masks,
            ) = em.multi_frame_steps_batch(
                self.mstate, rgbs, depths, uvs, self.tick,
                weight_multiplier, self.sp_params, self.cam, self.cfg,
                bucket_fuse,
                bucket_obj=self._bucket_objects(k_ahead=len(frames)),
            )
            self._last_args = ("multi_batch", (rgbs, depths, uvs))
            self.last_mask = self.mstate.prev_mask
            # per-frame masks ride back stacked ([k, H, W] u8) so batched and
            # single-frame paths expose identical '-es' exports
            self._mask_dev = (list([f.timestamp for f in frames]), masks)
            self._maybe_prewarm()
            st = self.mstate
            self.state = GlobalState(
                smap=st.smap, pose=st.pose, prev_pose=st.prev_pose,
                filled=st.filled,
                last_intensity_coarse=st.last_intensity_coarse,
                tracks=st.tracks, rng=st.rng, ferns=st.ferns,
                bad_track_count=st.bad_track_count, lost=st.lost,
                pose_matches=st.pose_matches,
            )
            stamps = [f.timestamp for f in frames]
            # batched records (ts is a list) — expanded lazily at fetch time
            # like _pose_dev, so no per-frame device slicing happens here
            self._obj_pose_dev.append((stamps, obj_poses, obj_active))
            self._spawn_dev.append((stamps, spawns, slots, refine_Ts))
            self._stats_dev.append(stats)
            self._pose_dev.append((stamps, poses))
            self.tick += len(frames)
            return self.current_stats(sync=False)
        self.state, stats, poses = _frame_steps_batch(
            self.state, rgbs, depths, self.tick, weight_multiplier,
            self.sp_params, self.cam, self.cfg, bucket_fuse, bucket_pred, uvs,
        )
        self._last_args = ("batch", (rgbs, depths, uvs))
        self._maybe_prewarm()
        # store the BATCHED device arrays whole: slicing stats[i]/poses[i]
        # here would enqueue a ~20 ms tunnel dispatch per slice, defeating
        # the batching; consumers expand at fetch time
        self._stats_dev.append(stats)
        self._pose_dev.append(([f.timestamp for f in frames], poses))
        self.tick += len(frames)
        return self.current_stats(sync=False)

    def upload(self, frame: FrameData, background: bool = True):
        """Stage a frame's arrays on the device ahead of process_frame.

        Callers should pipeline: upload frame t+1 while frame t computes.
        Depth rides in the reader's native dtype (u16 mm from sensors/logs
        converts to metres on device; f32 passes through — see upload_batch
        on why host repacking is avoided). Returns a handle accepted by
        process_frame.
        """

        def _put():
            depth = frame.depth
            if self.cfg.upload_depth_mm and depth.dtype == np.float32:
                depth = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
            if self.cfg.upload_yuv420 and frame.rgb.dtype == np.uint8:
                y, uv = _pack_yuv420(frame.rgb)
                arrs = [y, depth, uv]
            else:
                arrs = [frame.rgb, depth]
            if frame.mask is not None:
                arrs.append(frame.mask.astype(np.int32))
            return jax.block_until_ready(jax.device_put(tuple(arrs)))

        if background:
            if self._upload_pool is None:
                import concurrent.futures

                self._upload_pool = concurrent.futures.ThreadPoolExecutor(1)
            return (frame, self._upload_pool.submit(_put))
        return (frame, _put())

    def process_frame(
        self,
        frame,
        gt_pose: Optional[np.ndarray] = None,
        weight_multiplier: float = 1.0,
    ) -> Dict[str, float]:
        """Process one frame: a FrameData, or a handle from upload()."""
        from multimotionfusion_tpu.utils.stopwatch import Stopwatch

        sw = Stopwatch.get()
        sw.tick("Run")  # the reference GUI's overall frame timer
        cam = self.cam
        if self._zero_mask is None:
            self._zero_mask = jnp.zeros((cam.height, cam.width), jnp.int32)
        if isinstance(frame, tuple):
            frame, staged = frame
            arrs = staged.result() if hasattr(staged, "result") else staged
        else:
            arrs = self.upload(frame, background=False)[1]
        uv = None
        if arrs[0].ndim == 2:  # YUV wire format: (Y, depth, UV[, mask])
            rgb_u8, depth_raw, uv = arrs[:3]
            mask = arrs[3] if len(arrs) == 4 else self._zero_mask
        elif len(arrs) == 3:
            rgb_u8, depth_raw, mask = arrs
        else:
            rgb_u8, depth_raw = arrs
            mask = self._zero_mask

        if self.tick == 1:
            pose0 = jnp.asarray(
                gt_pose if gt_pose is not None else np.eye(4), jnp.float32
            )
            self.state, stats, tracks_segm = _init_step(
                rgb_u8, depth_raw, pose0, self.tick, self.sp_params, cam,
                self.cfg, uv,
            )
            if self.cfg.enable_multi_model:
                from multimotionfusion_tpu import engine_multi as em

                objects = em.empty_objects(self.cfg, cam)
                if tracks_segm is None:  # init_lvl == segm_lvl: stub table
                    tracks_segm = tracker.empty(
                        1, 2, self.cfg.keypoints.desc_dim
                    )
                self.mstate = em.MultiState(
                    smap=self.state.smap, pose=self.state.pose,
                    prev_pose=self.state.prev_pose, filled=self.state.filled,
                    pred_own=jnp.zeros((cam.height, cam.width), jnp.int32),
                    last_intensity_coarse=self.state.last_intensity_coarse,
                    tracks=self.state.tracks, tracks_segm=tracks_segm,
                    rng=self.state.rng,
                    objects=objects,
                    prev_mask=jnp.zeros((cam.height, cam.width), jnp.int32),
                    prev_intensity=(
                        rgb_u8.astype(jnp.float32)
                        if uv is not None
                        else imops.rgb_to_intensity(rgb_u8.astype(jnp.float32))
                    ),
                    last_spawn=jnp.zeros((), jnp.int32),
                    ferns=self.state.ferns,
                    bad_track_count=self.state.bad_track_count,
                    lost=self.state.lost,
                    pose_matches=self.state.pose_matches,
                )
            self._hwm = int(self.state.smap.count)
            self._hwm_tick = 1
        elif self.cfg.enable_multi_model:
            from multimotionfusion_tpu import engine_multi as em

            bucket_fuse, _ = self._buckets()
            bucket_obj = self._bucket_objects()
            self.mstate, stats, seg_mask, aux = em.multi_frame_step(
                self.mstate, rgb_u8, depth_raw, uv, self.tick,
                weight_multiplier, self.sp_params, cam, self.cfg, bucket_fuse,
                ext_mask=mask, bucket_obj=bucket_obj,
            )
            self._last_args = ("multi", (rgb_u8, depth_raw, uv, mask))
            self.last_mask = seg_mask  # device array; fetched only on export
            self._maybe_prewarm()
            # mirror the global-model fields for shared accessors/exports
            self.state = GlobalState(
                smap=self.mstate.smap, pose=self.mstate.pose,
                prev_pose=self.mstate.prev_pose, filled=self.mstate.filled,
                last_intensity_coarse=self.mstate.last_intensity_coarse,
                tracks=self.mstate.tracks, rng=self.mstate.rng,
                ferns=self.mstate.ferns,
                bad_track_count=self.mstate.bad_track_count,
                lost=self.mstate.lost,
                pose_matches=self.mstate.pose_matches,
            )
            self._obj_pose_dev.append(
                (frame.timestamp, self.mstate.objects.pose,
                 self.mstate.objects.active)
            )
            # lazily-resolved spawn records for trajectory back-dating
            self._spawn_dev.append(
                (frame.timestamp, aux.spawn, aux.slot, aux.refine_T)
            )
        else:
            if self.cfg.odom_init == "tf" and gt_pose is not None:
                self.state = self.state._replace(
                    pose=jnp.asarray(gt_pose, jnp.float32)
                )
            bucket_fuse, bucket_pred = self._buckets()
            self.state, stats = _frame_step(
                self.state, rgb_u8, depth_raw, mask, self.tick,
                weight_multiplier, self.sp_params, cam, self.cfg,
                bucket_fuse, bucket_pred, uv,
            )
            self._last_args = ("single", (rgb_u8, depth_raw, mask, uv))
            self._maybe_prewarm()
        self._stats_dev.append(stats)
        self._pose_dev.append((frame.timestamp, self.state.pose))
        self.tick += 1
        sw.tock("Run")
        sw.send_all()
        return self.current_stats(sync=False)

    # -- model lifecycle events (reference Core/Callbacks.h) ----------------

    def add_model_listener(self, event: str, fn):
        """Register a listener for "new_model" / "inactive_model" events
        (== CallbackBuffer::addListener; used by the reference's GUI and
        RosStatePublisher, MultiMotionFusion.h:300-303). The callback
        receives a dict {event, timestamp, id, redetected?}."""
        assert event in ("new_model", "inactive_model")
        self._listeners.setdefault(event, []).append(fn)

    def drain_events(self) -> List[Dict]:
        """Resolve lifecycle events since the last drain and fire listeners.

        Events are derived from the device-side lifecycle logs the multi-model
        step already records (spawn flag + per-slot active masks), so the
        frame loop stays sync-free until someone actually asks for events.
        """
        events: List[Dict] = []
        self._expand_lifecycle_logs()
        log = self._obj_pose_dev
        while self._event_cursor < len(log):
            i = self._event_cursor
            ts, _, active = log[i]
            act = np.asarray(active)
            spawned_slot = -1
            if i < len(self._spawn_dev):
                _, sp, sl, _ = self._spawn_dev[i]
                if bool(np.asarray(sp)):
                    spawned_slot = int(np.asarray(sl))
            prev = self._active_last
            if prev is not None:
                for k in np.nonzero(act & ~prev)[0]:
                    events.append({
                        "event": "new_model",
                        "timestamp": ts,
                        "id": int(k) + 1,
                        # active without a spawn flag = a stored model was
                        # re-attached by redetection (getBestMatch path)
                        "redetected": int(k) != spawned_slot,
                    })
                for k in np.nonzero(prev & ~act)[0]:
                    events.append({
                        "event": "inactive_model",
                        "timestamp": ts,
                        "id": int(k) + 1,
                    })
            self._active_last = act
            self._event_cursor += 1
        for ev in events:
            for fn in self._listeners.get(ev["event"], []):
                fn(ev)
        return events

    def batch_masks(self):
        """Per-frame segmentation masks of the LAST batched multi-model call
        as [(timestamp, [H, W] uint8 ndarray), ...]; empty if the last call
        was single-frame (use last_mask then). Keeps '-es' exports identical
        between the batched and single-frame paths (the scan stacks every
        frame's mask, not just the final one)."""
        if self._mask_dev is None:
            return []
        stamps, masks = self._mask_dev
        arr = np.asarray(masks)
        return list(zip(stamps, arr))

    def pose_matches(self) -> List[Dict]:
        """Loop-closure PoseMatch records (reference Core/PoseMatch.h), newest
        last; at most MatchLog.capacity retained."""
        if self.state is None:
            return []
        log = self.state.pose_matches
        n = int(log.count)
        cap = log.capacity
        out = []
        times = np.asarray(log.times)
        poses = np.asarray(log.poses)
        acc = np.asarray(log.accepted)
        err = np.asarray(log.cons_err)
        for i in range(max(0, n - cap), n):
            s = i % cap
            out.append(
                {
                    "source_time": int(times[s, 0]),
                    "dest_time": int(times[s, 1]),
                    "source_pose": poses[s, 0],
                    "dest_pose": poses[s, 1],
                    "accepted": bool(acc[s]),
                    "mean_cons_err": float(err[s]),
                }
            )
        return out

    def current_stats(self, sync: bool = True) -> Dict[str, float]:
        """Latest per-frame stats; with sync=False returns the last fetched."""
        if sync and self._stats_dev:
            s = np.asarray(self._stats_dev[-1])
            if s.ndim == 2:  # batched step: last frame of the batch
                s = s[-1]
            if self.cfg.enable_multi_model and s.shape[0] > 9 and self.tick > 2:
                self.stats = {
                    "icp_error": float(s[0]),
                    "icp_count": float(s[1]),
                    "rgb_error": float(s[2]),
                    "rgb_count": float(s[3]),
                    "surfels": float(s[4]),
                    "hwm": float(s[5]),
                    "spawned": float(s[6]),
                    "active_objects": float(s[7]),
                    "lost": float(s[8]),
                    "segment_px": [float(v) for v in s[9:]],
                }
            else:
                self.stats = {
                    "icp_error": float(s[STAT_ICP_ERROR]),
                    "icp_count": float(s[STAT_ICP_COUNT]),
                    "rgb_error": float(s[STAT_RGB_ERROR]),
                    "rgb_count": float(s[STAT_RGB_COUNT]),
                    "surfels": float(s[STAT_SURFELS]),
                    "hwm": float(s[STAT_HWM]),
                }
        return dict(self.stats)

    def finish(self):
        """Drain the device pipeline (call before timing-sensitive readouts)."""
        if self.state is not None:
            jax.block_until_ready(self.state.pose)
        return self.current_stats(sync=True)

    # -- export (MultiMotionFusion::exportPoses/savePly, :1001-1045) -------

    # -- full-session checkpoint / resume ----------------------------------
    # The reference has NO session resume (SURVEY.md §5.4: only the model DB
    # persists object clouds); here the whole device-resident state pytree
    # (surfel maps, poses, track table, fern DB, object slots, pose log)
    # round-trips through one file, so long mapping sessions survive
    # restarts and crashes.

    # v2: GlobalState grew the loop-closure PoseMatch log
    # v3: ObjectSlots grew conf_t + max_depth; MultiState dropped pred_depth
    # v4: composite multi-model redesign — ObjectSlots dropped the per-slot
    #     [S, H, W] prediction images; MultiState grew pose_matches
    # v5: MultiState grew tracks_segm (per-level keypoint trackers,
    #     reference MultiMotionFusion.cpp:83-87)
    CKPT_VERSION = 5

    def save_checkpoint(self, path: str) -> str:
        import pickle

        self.finish()
        to_host = lambda t: jax.tree.map(np.asarray, t)  # noqa: E731
        blob = {
            "version": self.CKPT_VERSION,
            "camera": dataclasses_asdict_safe(self.cfg.camera),
            "tick": self.tick,
            "state": to_host(self.state) if self.state is not None else None,
            "mstate": to_host(self.mstate) if self.mstate is not None else None,
            "pose_log": self._expand_pose_log(),
            "obj_pose_log": [
                (ts, np.asarray(p), np.asarray(a))
                for ts, p, a in self._obj_pose_dev
            ],
            "spawn_log": [
                (ts, bool(np.asarray(sp)), int(np.asarray(sl)), np.asarray(rT))
                for ts, sp, sl, rT in self._spawn_dev
            ],
            "hwm": self._hwm,
            "hwm_tick": self._hwm_tick,
            "growth_rate": self._growth_rate,
            "bucket": self._bucket,
        }
        with open(path, "wb") as f:
            pickle.dump(blob, f)
        return path

    def load_checkpoint(self, path: str):
        import pickle

        with open(path, "rb") as f:
            blob = pickle.load(f)
        if blob["version"] != self.CKPT_VERSION:
            raise ValueError(f"checkpoint version {blob['version']} unsupported")
        if blob["camera"] != dataclasses_asdict_safe(self.cfg.camera):
            raise ValueError("checkpoint camera model differs from engine config")
        to_dev = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
        self.tick = blob["tick"]
        self.state = to_dev(blob["state"]) if blob["state"] is not None else None
        self.mstate = (
            to_dev(blob["mstate"]) if blob["mstate"] is not None else None
        )
        self._pose_dev = [(ts, jnp.asarray(p)) for ts, p in blob["pose_log"]]
        self._obj_pose_dev = [
            (ts, jnp.asarray(p), jnp.asarray(a))
            for ts, p, a in blob["obj_pose_log"]
        ]
        self._spawn_dev = list(blob.get("spawn_log", []))
        self._stats_dev.clear()
        # don't replay pre-checkpoint lifecycle events to fresh listeners
        self._event_cursor = len(self._obj_pose_dev)
        self._active_last = (
            np.asarray(self._obj_pose_dev[-1][2]) if self._obj_pose_dev else None
        )
        self._hwm = blob["hwm"]
        self._hwm_tick = blob["hwm_tick"]
        self._growth_rate = blob["growth_rate"]
        self._bucket = blob["bucket"]
        return self

    def export_poses(self, export_dir: str) -> List[str]:
        """Write per-model TUM trajectories poses-<id>.txt.

        Camera trajectory = global model poses; object trajectory = P_0 P_m^-1
        (the object's motion in world frame), matching exportPoses
        (MultiMotionFusion.cpp:1020-1045).
        """
        import os

        self.finish()
        paths = []
        pose_log = self._expand_pose_log()
        gposes = {ts: p for ts, p in pose_log}
        models = [(0, pose_log)] + [
            (m.id, m.pose_log) for m in self.models if m.id != 0
        ]
        # object-slot trajectories (multi-model mode): only ticks where the
        # slot was active contribute
        if self._obj_pose_dev:
            self._expand_lifecycle_logs()
            n_slots = self.cfg.object_slots
            obj_logs = {k: [] for k in range(n_slots)}
            for ts, poses, active in self._obj_pose_dev:
                poses = np.asarray(poses)
                active = np.asarray(active)
                for k in range(n_slots):
                    if active[k]:
                        obj_logs[k].append((ts, poses[k]))
            # back-date each spawned object's trajectory from its track
            # history (Model::refineTrackSubset, Model.cpp:649-737): compose
            # the per-step transforms backwards from identity at spawn
            ts_order = [ts for ts, _ in pose_log]
            ts_index = {ts: i for i, ts in enumerate(ts_order)}
            for ts, sp, sl, rT in self._spawn_dev:
                if not bool(np.asarray(sp)):
                    continue
                i = ts_index.get(ts)
                if i is None:
                    continue
                sl = int(np.asarray(sl))
                rT = np.asarray(rT)
                P = np.eye(4, dtype=np.float64)
                backdated = []
                for k in range(rT.shape[0]):
                    j = i - k - 1
                    if j < 0 or not np.all(np.isfinite(rT[k])):
                        break
                    # P(s-k-1) = P(s-k) @ inv(T_k), T_k: p(s-k) -> p(s-k-1)
                    P = P @ np.linalg.inv(rT[k])
                    backdated.append((ts_order[j], P.astype(np.float32)))
                obj_logs[sl] = backdated[::-1] + obj_logs[sl]
            for k, log in obj_logs.items():
                if log:
                    models.append((k + 1, log))
        for model_id, log in models:
            path = os.path.join(export_dir, f"poses-{model_id}.txt")
            with open(path, "w") as f:
                for ts, pose in log:
                    if model_id == 0:
                        T = pose
                    else:
                        p0 = gposes.get(ts)
                        if p0 is None:
                            continue
                        T = p0 @ np.linalg.inv(np.asarray(pose))
                    q = np.asarray(se3.to_quaternion_xyzw(jnp.asarray(T[:3, :3])))
                    t = T[:3, 3]
                    f.write(
                        f"{ts * 1e-9:.9f} {t[0]} {t[1]} {t[2]} "
                        f"{q[0]} {q[1]} {q[2]} {q[3]}\n"
                    )
            paths.append(path)
        return paths

    # -- runtime controls (reference ROS services, RosInterface.cpp:5-37) --
    # Config is static under jit, so mode switches swap the config object;
    # the next frame compiles (and caches) the new variant.

    def reset(self):
        """Service 'reset': drop all state, restart at tick 1."""
        self.tick = 1
        self.state = None
        self.mstate = None
        self.models = [Model(0, self.cfg)]
        self._stats_dev.clear()
        self._pose_dev.clear()
        self._obj_pose_dev.clear()
        self._spawn_dev.clear()
        self._hwm = 0
        self._hwm_tick = 0
        self._growth_rate = 4096
        self._bucket = 0
        self._last_args = None
        self._prewarmed.clear()
        self._event_cursor = 0
        self._active_last = None

    def set_odom_init(self, mode: str):
        """Service 'set_odom_init' ('kp' | 'tf' | '')."""
        import dataclasses

        assert mode in ("kp", "tf", "")
        self.cfg = dataclasses.replace(self.cfg, odom_init=mode)

    def set_icp_refine(self, enabled: bool):
        import dataclasses

        self.cfg = dataclasses.replace(self.cfg, icp_refine=enabled)

    def set_segm_mode(self, mode: str):
        import dataclasses

        self.cfg = _normalize_cfg(
            dataclasses.replace(
                self.cfg,
                segmentation=dataclasses.replace(
                    self.cfg.segmentation, mode=mode
                ),
            )
        )

    def set_segm_param(self, name: str, value):
        """Live-tune one segmentation knob (the reference GUI pushes the CRF
        parameter panel into Segmentation every frame, MainController.cpp:
        643-670). Numeric fields of SegmentationConfig only; a changed value
        recompiles the frame step once (params are compile-time constants in
        the jitted program — the persistent cache makes repeat values free)."""
        import dataclasses

        seg = self.cfg.segmentation
        fields = {f.name: f.type for f in dataclasses.fields(seg)}
        if name not in fields or name == "mode":
            raise ValueError(f"unknown segmentation parameter '{name}'")
        old = getattr(seg, name)
        if not isinstance(old, (int, float)) or isinstance(old, bool):
            raise ValueError(f"parameter '{name}' is not numeric")
        self.cfg = _normalize_cfg(
            dataclasses.replace(
                self.cfg,
                segmentation=dataclasses.replace(
                    seg, **{name: type(old)(value)}
                ),
            )
        )

    def set_inhibit_new_models(self, inhibit: bool):
        import dataclasses

        self.cfg = dataclasses.replace(
            self.cfg, enable_model_spawning=not inhibit
        )

    def deactivate_model(self, model_id: int):
        """Service 'deactivate_model': force an object slot inactive."""
        if self.mstate is None or model_id < 1:
            return False
        slot = model_id - 1
        obj = self.mstate.objects
        self.mstate = self.mstate._replace(
            objects=obj._replace(active=obj.active.at[slot].set(False))
        )
        return True

    def store_models(self, export_dir: str) -> List[str]:
        """Persist deactivated object models to <export_dir>/model_db
        (Model::store via inactivateModel, MultiMotionFusion.cpp:962-981)."""
        from multimotionfusion_tpu.model import model_db

        self.finish()
        if self.mstate is None:
            return []
        paths = []
        obj = self.mstate.objects
        stored = np.asarray(obj.stored)
        active = np.asarray(obj.active)
        for k in range(self.cfg.object_slots):
            if not stored[k] or active[k]:
                continue
            d = np.asarray(obj.data[k])
            alive = d[sm.ALIVE] > 0
            surfels = {
                "position": d[sm.POS].T[alive],
                "confidence": d[sm.CONF][alive],
                "color": d[sm.COLOR].T[alive],
                "normal": d[sm.NORMAL].T[alive],
                "radius": d[sm.RADIUS][alive],
            }
            pose_world = np.asarray(self.mstate.pose) @ np.linalg.inv(
                np.asarray(obj.pose[k])
            )
            paths.append(
                model_db.save_model(
                    export_dir, k + 1, surfels,
                    np.asarray(obj.stored_desc[k]),
                    np.asarray(obj.stored_p3d[k]),
                    np.asarray(obj.stored_valid[k]),
                    pose_world,
                )
            )
        return paths

    def restore_models(self, export_dir: str) -> int:
        """Pre-load stored models as inactive redetection candidates
        ('-restore', MultiMotionFusion.cpp:131-145)."""
        from multimotionfusion_tpu.model import model_db

        if self.mstate is None:
            raise RuntimeError("restore_models requires multi-model mode + tick 1")
        n = 0
        obj = self.mstate.objects
        ks = obj.stored_desc.shape[1]
        dd = obj.stored_desc.shape[2]
        for path in model_db.list_models(export_dir):
            if n >= self.cfg.object_slots:
                break
            m = model_db.load_model(path)
            desc = np.zeros((ks, dd), np.float32)
            p3d = np.zeros((ks, 3), np.float32)
            valid = np.zeros((ks,), bool)
            cnt = min(len(m["descriptors"]), ks)
            desc[:cnt] = m["descriptors"][:cnt, :dd]
            p3d[:cnt] = m["coordinates"][:cnt]
            valid[:cnt] = True
            obj = obj._replace(
                stored=obj.stored.at[n].set(True),
                stored_desc=obj.stored_desc.at[n].set(jnp.asarray(desc)),
                stored_p3d=obj.stored_p3d.at[n].set(jnp.asarray(p3d)),
                stored_valid=obj.stored_valid.at[n].set(jnp.asarray(valid)),
            )
            n += 1
        self.mstate = self.mstate._replace(objects=obj)
        return n

    def save_ply(self, export_dir: str) -> List[str]:
        import os

        from multimotionfusion_tpu.io import ply

        self.finish()
        paths = []
        for model in [self.global_model] + self.models[1:]:
            path = os.path.join(export_dir, f"cloud-{model.id}.ply")
            ply.write_surfel_ply(
                path, model.download(), self.cfg.surfels.conf_threshold
            )
            paths.append(path)
        return paths
