"""Multi-model engine: per-rigid-body tracking, segmentation, lifecycle.

TPU re-design of the multi-model path of reference
Core/MultiMotionFusion::processFrame (MultiMotionFusion.cpp:207-854):
per frame — keypoints -> per-model pose init + masked ICP -> flow-CRF
segmentation -> spawn / deactivate -> per-model fuse + clean -> predict.

TPU-first structure (vs the reference's sequential per-model loop over
heap-allocated Model objects):
- object models live in FIXED device-resident slots (batched arrays with an
  `active` mask); spawning writes into a free slot and deactivation clears a
  flag — all inside the jitted frame step, with no host round-trip and no
  recompilation (the reference's host decides these on downloaded scalars);
- the segmentation mask PARTITIONS pixels between models, so every
  image-sized pass runs ONCE as a composite over all models instead of
  (1 + S) times (the round-2 design vmapped the reference's per-model loop;
  at 5 slots that paid ~6 full images of tracking/render/fuse per frame):
  * tracking: one GN pass solves ALL models (odometry/multi.py);
  * prediction/fusion/clean: one owner-partitioned index map over the
    CONCATENATED (flat) surfel storage (rasterize.predict_indices_flat,
    fusion.fuse_flat / clean_flat);
  * only the segmentation's reprojection term needs every model's depth at
    every pixel — rendered per model at CRF scale in one offset scatter
    (rasterize.render_model_depths);
- the mask used for masked odometry is the PREVIOUS frame's (the
  reference's MASK texture also still holds it at odometry time).

Object-model conventions follow the reference: slot k owns mask id k+1; a
new model's pose starts at identity so its map frame is the camera frame at
spawn; the exported object trajectory is P_0 P_m^-1 (exportPoses).

The legacy CoFusion CRF mode ("crf") needs per-model ICP error images over
the WHOLE image (Segmentation.cpp:212-332) which the owner-composite cannot
produce, so it keeps the round-2 per-slot path (_multi_frame_step_legacy) —
a parity feature, not the performance path.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.config import CameraModel, EngineConfig
from multimotionfusion_tpu.model import ferns as ferns_mod
from multimotionfusion_tpu.model import fusion, loop_closure, surfel_map as sm
from multimotionfusion_tpu.model.fillin import FilledMaps, fill_in
from multimotionfusion_tpu.odometry import levels as lv
from multimotionfusion_tpu.odometry import multi as modo_mod
from multimotionfusion_tpu.odometry import rgbd
from multimotionfusion_tpu.ops import image as imops
from multimotionfusion_tpu.ops import ransac as ransac_ops
from multimotionfusion_tpu.ops import rasterize
from multimotionfusion_tpu.segmentation import flow_crf as seg
from multimotionfusion_tpu.tracking import tracker
from multimotionfusion_tpu.utils import se3

# global-segment subsample stride for the CRF-scale per-model depth render
# (see the render_model_depths call below); 1 disables (env override for
# perf bisection)
# Stride choice is coverage-critical, not just a perf knob: the CRF-scale
# per-model depth is a scatter-MIN, and a cell whose true-surface surfel got
# strided out "predicts" whatever candidate survived (often a stale ghost or
# nothing) — measured at stride 8 as a speckled field of phantom OUTLIER
# cells across the whole image that the CRF then assembles into phantom
# new-object segments. Stride 2 global / dense objects: strides above that
# were measured to destabilise the five-mover lifecycle even with a fill
# (the min over fewer candidates biases pred depth off the true surface at
# exactly the young-model cells that drive spawning) — object stride 2 was
# re-tried in round 5 and re-reverted: the five-mover battery flickers
# (spawn/die cycles) because a JUST-SPAWNED model's thinned depth coverage
# weakens its reprojection claim before maturity.
_RMD_GLOBAL_STRIDE = int(os.environ.get("MMF_RMD_STRIDE", "2"))
_RMD_OBJECT_STRIDE = int(os.environ.get("MMF_RMD_OBJ_STRIDE", "1"))


def _stride_cols(a: jnp.ndarray, s: int) -> jnp.ndarray:
    """a[..., ::s] via reshape (last dim divisible by s) — a strided slice
    lowers to a gather on TPU (~40x slower at frame shapes,
    tools/microbench_scatter2.py); reshape[..., 0] is a contiguous slice."""
    if s == 1:
        return a
    n = a.shape[-1]
    if n % s:
        return a[..., ::s]
    return a.reshape(a.shape[:-1] + (n // s, s))[..., 0]


class ObjectSlots(NamedTuple):
    """Batched object-model state (leading axis = slot; mask id = slot + 1)."""

    data: jnp.ndarray  # [S, CHANNELS, cap_o]
    count: jnp.ndarray  # [S] int32 high-water mark
    pose: jnp.ndarray  # [S, 4, 4]
    active: jnp.ndarray  # [S] bool
    unseen: jnp.ndarray  # [S] int32 frames with zero segment pixels
    spawn_tick: jnp.ndarray  # [S] int32
    # per-slot confidence threshold, RAISED towards the segment's average
    # confidence as the model matures (reference MultiMotionFusion.cpp:615-620
    # setConfidenceThreshold(min(max(old, avgConfidence), 9))). This is what
    # sheds spawn-time contamination: surfels fused only once or twice (e.g. a
    # background fringe inside the spawn mask) fall below the rising gate and
    # stop rendering/claiming pixels, while the object's continuously-refreshed
    # surfels keep up with it.
    conf_t: jnp.ndarray  # [S] float32
    # per-slot max depth clamp = its segment's depth mean + 1.2 std, updated
    # every frame (reference MultiMotionFusion.cpp:408,486,563): background
    # beyond the object's depth band can neither render from its map nor be
    # fused into it — THE guard against background contamination of object
    # maps (a spawn mask's coarse fringe always includes background pixels).
    max_depth: jnp.ndarray  # [S] float32
    # redetection snapshot, captured at deactivation (Model::store keeps the
    # model's track descriptors + model-local coordinates; here the snapshot
    # stays on device so re-attachment is in-graph, Model.cpp:781-874)
    stored: jnp.ndarray  # [S] bool — slot holds a deactivated model
    stored_desc: jnp.ndarray  # [S, Ks, D]
    stored_p3d: jnp.ndarray  # [S, Ks, 3] model-local coordinates
    stored_valid: jnp.ndarray  # [S, Ks]
    # external-mask id owned by this slot ("precomputed" segmentation,
    # Segmentation.cpp:89-147); 0 = unassigned
    ext_id: jnp.ndarray  # [S] int32

    @property
    def num_slots(self) -> int:
        return self.data.shape[0]


class SpawnAux(NamedTuple):
    """Per-frame lifecycle outputs the host consumes lazily (no sync)."""

    spawn: jnp.ndarray  # [] bool — a fresh model claimed a slot this frame
    redetect: jnp.ndarray  # [] bool — a stored model was re-attached
    slot: jnp.ndarray  # [] int32 — the claimed slot
    refine_T: jnp.ndarray  # [L, 4, 4] per-step back-dating transforms


class MultiState(NamedTuple):
    """Device-resident state of the full multi-model pipeline."""

    smap: sm.SurfelMap  # global model (id 0)
    pose: jnp.ndarray
    prev_pose: jnp.ndarray
    filled: FilledMaps  # cross-model composite prediction (+ global fill-in)
    # model id of each prediction pixel's winning surfel (n_models = none);
    # the tracking bank gates taps by it so each model's rows only ever
    # sample ITS OWN predicted surface (== the reference's per-model renders)
    pred_own: jnp.ndarray  # [H, W] int32
    last_intensity_coarse: jnp.ndarray
    tracks: tracker.TrackTable  # the init_lvl tracker (pose seeds, redetect)
    # the segm_lvl tracker feeding segmentation velocities (reference keeps
    # one PointTracker per used pyramid level, MultiMotionFusion.cpp:83-87;
    # Segmentation consumes tracker[segm_lvl] at :148). A 1-slot stub when
    # init_lvl == segm_lvl (the default — one table serves both consumers).
    tracks_segm: tracker.TrackTable
    rng: jnp.ndarray
    objects: ObjectSlots
    prev_mask: jnp.ndarray  # [H, W] int32 segmentation of the previous frame
    prev_intensity: jnp.ndarray  # [H, W] previous frame intensity (flow)
    last_spawn: jnp.ndarray  # [] int32 tick of the last spawn (cool-down)
    # global-model loop-closure/relocalisation state: the reference runs
    # closeLoops for the global model regardless of multi-model mode
    # (MultiMotionFusion.cpp:629-695)
    ferns: ferns_mod.FernDB
    bad_track_count: jnp.ndarray  # [] int32 consecutive bad-covariance frames
    lost: jnp.ndarray  # [] bool
    pose_matches: loop_closure.MatchLog  # loop-closure PoseMatch records


def empty_objects(cfg: EngineConfig, cam: CameraModel) -> ObjectSlots:
    s = cfg.object_slots
    ks = cfg.keypoints.max_keypoints
    d = cfg.keypoints.desc_dim
    return ObjectSlots(
        data=jnp.zeros((s, sm.CHANNELS, cfg.object_capacity), jnp.float32),
        count=jnp.zeros((s,), jnp.int32),
        pose=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (s, 4, 4)),
        active=jnp.zeros((s,), bool),
        unseen=jnp.zeros((s,), jnp.int32),
        spawn_tick=jnp.zeros((s,), jnp.int32),
        conf_t=jnp.full((s,), cfg.surfels.object_conf_threshold, jnp.float32),
        max_depth=jnp.full((s,), cfg.surfels.depth_cutoff, jnp.float32),
        stored=jnp.zeros((s,), bool),
        stored_desc=jnp.zeros((s, ks, d), jnp.float32),
        stored_p3d=jnp.zeros((s, ks, 3), jnp.float32),
        stored_valid=jnp.zeros((s, ks), bool),
        ext_id=jnp.zeros((s,), jnp.int32),
    )


def _depth_stats(mask, new_label_mask, depth, m):
    """[m+1] mean / std of frame depth per label (index m = new label).

    Feeds the per-model max-depth clamp maxDepth = mean + 1.2 std
    (reference MultiMotionFusion.cpp:408)."""
    def one(sel):
        sel = sel & (depth > 0)
        n = jnp.maximum(jnp.sum(sel.astype(jnp.float32)), 1.0)
        mu = jnp.sum(jnp.where(sel, depth, 0.0)) / n
        var = jnp.sum(jnp.where(sel, depth**2, 0.0)) / n - mu**2
        return mu, jnp.sqrt(jnp.maximum(var, 0.0))

    means, stds = jax.vmap(
        lambda k: one(jnp.where(k < m, mask == k, new_label_mask))
    )(jnp.arange(m + 1))
    return means, stds


def _track_velocities(
    table: tracker.TrackTable,
    time,
    poses_prev: jnp.ndarray,  # [M, 4, 4] per-model pose at time-1
    poses_new: jnp.ndarray,  # [M, 4, 4] per-model pose at time
    cam: CameraModel,
    fps: float = 30.0,
):
    """[M, T] px/s velocity error of each track under each model's motion.

    == the PIXEL_S metric over Model::computeTrackProjectionStartEnd
    (Segmentation.cpp:979-1007): predict the start keypoint's pixel under the
    model's motion and compare with the observed end pixel.
    """
    p0, p1, valid = tracker.last_pair(table, time)

    def per_model(T0, T1):
        # point fixed in the model's frame: g = T0 p0; predicted cam pt = T1^-1 g
        g = se3.transform_points(T0, p0)
        pc = se3.transform_points(se3.inverse_T(T1), g)
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = pc[:, 0] * cam.fx / z + cam.cx
        v = pc[:, 1] * cam.fy / z + cam.cy
        z1 = jnp.maximum(p1[:, 2], 1e-6)
        u1 = p1[:, 0] * cam.fx / z1 + cam.cx
        v1 = p1[:, 1] * cam.fy / z1 + cam.cy
        return jnp.sqrt((u - u1) ** 2 + (v - v1) ** 2) * fps

    vel = jax.vmap(per_model)(poses_prev, poses_new)
    return vel, valid


def _kp_seed(tracks, time, model_sel, pose, rng, cfg, is_global: bool):
    """RANSAC pose init from the model's own tracks (Model::getLastTrackTransform).

    Global model: Tnew = pose @ T_rel; objects: Tnew = T_rel @ pose
    (MultiMotionFusion.cpp:320-335)."""
    p0, p1, valid = tracker.last_pair(tracks, time)
    valid = valid & model_sel
    rng, sub = jax.random.split(rng)
    res = ransac_ops.ransac_fit(sub, p0, p1, valid, cfg.ransac)
    good = (
        res.ok
        & (res.num_inliers >= 24)
        & (res.error < 0.008)
        & jnp.all(jnp.isfinite(res.transform))
        & (jnp.linalg.norm(res.transform[:3, 3]) < 0.03)  # inter-frame sanity
    )
    T_rel = jnp.where(good, res.transform, jnp.eye(4, dtype=jnp.float32))
    seeded_pose = pose @ T_rel if is_global else T_rel @ pose
    return seeded_pose, good, rng


def _seed_slots(obj, tracks, time, rng, cfg):
    """Per-slot keypoint pose seeds (vmapped RANSAC; see _kp_seed)."""
    n_slots = obj.num_slots

    def seed_one(slot_pose, slot_idx, key):
        sel = tracks.model_id == (slot_idx + 1)
        p0, p1, valid = tracker.last_pair(tracks, time)
        valid = valid & sel
        res = ransac_ops.ransac_fit(key, p0, p1, valid, cfg.ransac)
        good = (
            res.ok
            & (res.num_inliers >= 12)
            & (res.error < 0.008)
            & jnp.all(jnp.isfinite(res.transform))
            # an object cannot plausibly jump > 5 cm between frames; junk
            # consensus (aliased descriptors) costs more than no seed
            & (jnp.linalg.norm(res.transform[:3, 3]) < 0.05)
        )
        T_rel = jnp.where(good, res.transform, jnp.eye(4, dtype=jnp.float32))
        # NOTE: the reference premultiplies for objects (T_rel * pose,
        # MultiMotionFusion.cpp:330) under its own object-pose bookkeeping;
        # here object models share the camera's pose convention (the dense
        # solver is identical for all models), and consistency of
        # g = P_m(t) p_cam(t) for object-frame surfels requires
        # P_m(t1) = P_m(t0) @ T_rel, the same composition as the global model.
        return slot_pose @ T_rel, good

    rng, *keys = jax.random.split(rng, n_slots + 1)
    obj_seeds, obj_seed_ok = jax.vmap(seed_one)(
        obj.pose, jnp.arange(n_slots, dtype=jnp.int32), jnp.stack(keys)
    )
    return obj_seeds, obj_seed_ok, rng


def _redetect(obj, kps, kp_p3d, in_seg, rng, cfg):
    """Try to re-attach STORED inactive models to the new segment
    (Model::getBestMatch: descriptor match + RANSAC, gates error < 0.01 and
    > 5 inliers, Model.cpp:781-874 / MultiMotionFusion.cpp:490-559)."""
    n_slots = obj.num_slots

    def redetect_one(sdesc, sp3d, svalid, key):
        match_idx, _ = tracker.mutual_match(
            kps.desc, sdesc, in_seg, svalid, cfg.keypoints.patch_gate
        )
        matched = match_idx >= 0
        pm = sp3d[jnp.where(matched, match_idx, 0)]
        from multimotionfusion_tpu.config import REDETECT_RANSAC

        res = ransac_ops.ransac_fit(key, pm, kp_p3d, matched, REDETECT_RANSAC)
        # second-stage tightening: the 3 cm consensus radius (reference
        # MultiMotionFusion.cpp:513) finds the support set; refitting on the
        # points within 1 cm of that fit recovers the precise pose
        d = ransac_ops.residual_norms(res.transform, pm, kp_p3d)
        tight = matched & (d < 0.01)
        T2 = ransac_ops.kabsch_fit(pm, kp_p3d, tight)
        use2 = jnp.sum(tight.astype(jnp.int32)) >= 4
        T = jnp.where(use2, T2, res.transform)
        err = jnp.sum(
            jnp.where(tight, ransac_ops.residual_norms(T, pm, kp_p3d), 0.0)
        ) / jnp.maximum(jnp.sum(tight.astype(jnp.float32)), 1.0)
        err = jnp.where(use2, err, res.error)
        ok = (
            res.ok
            & (res.num_inliers > 5)
            & (err < 0.01)
            & jnp.all(jnp.isfinite(T))
        )
        return ok, err, T

    rng, *rkeys = jax.random.split(rng, n_slots + 1)
    red_ok, red_err, red_T = jax.vmap(redetect_one)(
        obj.stored_desc, obj.stored_p3d, obj.stored_valid, jnp.stack(rkeys)
    )
    return red_ok, red_err, red_T, rng


def _snapshot_tracks(obj, tracks, pose_all_slots):
    """Per-slot redetection snapshots from the track table (Model::store)."""
    n_slots = obj.num_slots
    ks = obj.stored_desc.shape[1]

    def snapshot_one(slot_idx, pose_slot):
        sel = tracks.active & (tracks.model_id == slot_idx + 1)
        s_last = jnp.mod(tracks.last_seen, tracks.history)
        p_cam = jnp.take_along_axis(
            tracks.p3d, s_last[:, None, None], axis=1
        )[:, 0]
        hasd = jnp.take_along_axis(tracks.has_depth, s_last[:, None], axis=1)[:, 0]
        valid = sel & hasd
        pm = se3.transform_points(pose_slot, p_cam)
        rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
        dest = jnp.where(valid & (rank < ks), rank, ks)
        d_out = jnp.zeros((ks + 1, tracks.desc.shape[1])).at[dest].set(
            tracks.desc, mode="drop"
        )[:ks]
        p_out = jnp.zeros((ks + 1, 3)).at[dest].set(pm, mode="drop")[:ks]
        v_out = jnp.zeros((ks + 1,), bool).at[dest].set(valid, mode="drop")[:ks]
        return d_out, p_out, v_out

    return jax.vmap(snapshot_one)(
        jnp.arange(n_slots, dtype=jnp.int32), pose_all_slots
    )


def _associate_tracks(table, mask, time, h, w):
    """Assign each track seen THIS frame the mask label under its keypoint
    (track <-> segment association, MultiMotionFusion.cpp:585-604)."""
    s1 = jnp.mod(time, table.history)
    txy = table.xy[:, s1]
    xi = jnp.clip(jnp.rint(txy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.rint(txy[:, 1]).astype(jnp.int32), 0, h - 1)
    seen_now = table.last_seen == time
    return table._replace(
        model_id=jnp.where(seen_now, mask[yi, xi], table.model_id)
    )


def _crf_camera(cam: CameraModel, scale: float) -> CameraModel:
    return CameraModel(
        width=int(cam.width * scale), height=int(cam.height * scale),
        fx=cam.fx * scale, fy=cam.fy * scale,
        cx=cam.cx * scale, cy=cam.cy * scale,
    )


class LifecycleOut(NamedTuple):
    """Slot updates of the shared spawn/redetect/deactivate/store block."""

    mask: jnp.ndarray  # [H, W] final mask (new label claimed or sentinel)
    spawn: jnp.ndarray  # [] bool
    any_red: jnp.ndarray  # [] bool
    target_slot: jnp.ndarray  # [] int32
    claim: jnp.ndarray  # [] bool
    new_id: jnp.ndarray  # [] int32
    refine_T: jnp.ndarray  # [L, 4, 4]
    fs_w: sm.FrameSurfels  # weighted frame surfels (fuse + spawn share one)
    weighting: jnp.ndarray
    is_spawn_slot: jnp.ndarray  # [S]
    is_red_slot: jnp.ndarray  # [S]
    obj_data: jnp.ndarray
    obj_count: jnp.ndarray
    obj_pose: jnp.ndarray
    obj_active: jnp.ndarray
    obj_stored: jnp.ndarray
    obj_spawn_tick: jnp.ndarray
    obj_ext_id: jnp.ndarray
    conf_t: jnp.ndarray
    max_depth: jnp.ndarray
    new_maxd: jnp.ndarray
    unseen: jnp.ndarray
    stored_desc: jnp.ndarray
    stored_p3d: jnp.ndarray
    stored_valid: jnp.ndarray
    tracks: tracker.TrackTable
    tracks_segm: tracker.TrackTable
    last_spawn: jnp.ndarray
    rng: jnp.ndarray


def _lifecycle_update(
    obj: ObjectSlots,
    seg_res,
    tracks,
    tracks_segm,
    use_segm_tracker: bool,
    kps,
    depth_filt,
    rgb,
    vmap_raw,
    vmap_f,
    nmap_f,
    new_pose0,
    prev_pose,
    obj_poses_new,
    time,
    last_spawn,
    weight_multiplier,
    seg_conf_sum,
    seg_conf_cnt,
    reactivate,
    new_ext_id,
    rng,
    cam: CameraModel,
    cfg: EngineConfig,
) -> LifecycleOut:
    """The spawn / redetect / deactivate / store block shared by the
    composite (`multi_frame_step`) and legacy (`_multi_frame_step_legacy`)
    paths (reference MultiMotionFusion.cpp:468-613 + Model::store gates
    :962-981). One implementation — the two paths previously carried
    behaviourally-identical copies (round-4 VERDICT weak #5, drift risk).

    `seg_conf_sum` / `seg_conf_cnt`: per-slot sums of predicted confidence
    over the slot's segment — the only caller-specific input (the composite
    path reads last frame's owner-gated composite prediction, the legacy
    path its per-slot prediction images).
    """
    scfg = cfg.surfels
    n_slots = obj.num_slots
    h, w = cam.height, cam.width
    allow_new = cfg.enable_model_spawning and cfg.object_slots > 0

    # ---- redetection (Model::getBestMatch) -------------------------------
    kp_p3d, kp_hasd = tracker.backproject_keypoints(kps, depth_filt, cam)
    kxi = jnp.clip(jnp.rint(kps.xy[:, 0]).astype(jnp.int32), 0, w - 1)
    kyi = jnp.clip(jnp.rint(kps.xy[:, 1]).astype(jnp.int32), 0, h - 1)
    in_seg = seg_res.new_label_mask[kyi, kxi] & kps.valid & kp_hasd
    # the per-slot match + 2-stage RANSAC only matters when an unclaimed new
    # segment AND a stored inactive model coexist — a rare event; lax.cond
    # skips its ~1 ms on every other frame
    redetect_possible = seg_res.has_new_label & jnp.any(
        obj.stored & ~obj.active
    )
    rng, red_key = jax.random.split(rng)

    def _do_red(k):
        ok, err, T, _ = _redetect(obj, kps, kp_p3d, in_seg, k, cfg)
        return ok, err, T

    def _no_red(k):
        return (
            jnp.zeros((n_slots,), bool),
            jnp.full((n_slots,), jnp.inf, jnp.float32),
            jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n_slots, 4, 4)),
        )

    red_ok, red_err, red_T = jax.lax.cond(
        redetect_possible, _do_red, _no_red, red_key
    )
    redetect_enabled = cfg.enable_redetection and allow_new
    red_ok = (
        red_ok & obj.stored & ~obj.active
        & seg_res.has_new_label & jnp.asarray(redetect_enabled)
    )
    any_red = jnp.any(red_ok)
    red_slot = jnp.argmin(jnp.where(red_ok, red_err, jnp.inf))

    # ---- spawn decision ---------------------------------------------------
    # spawn target: prefer slots that are neither active nor holding a stored
    # model; fall back to overwriting a stored one
    slot_score = obj.active.astype(jnp.int32) * 2 + (
        obj.stored & ~obj.active
    ).astype(jnp.int32)
    free_slot = jnp.argmin(slot_score)
    any_free = ~jnp.all(obj.active)
    cooled = (last_spawn == 0) | (
        time - last_spawn >= cfg.model_spawn_offset
    )
    spawn = (
        seg_res.has_new_label & any_free & jnp.asarray(allow_new) & cooled
        & ~any_red
    )
    target_slot = jnp.where(any_red, red_slot, free_slot)
    claim = spawn | any_red  # the segment gets a model id this frame
    new_id = target_slot + 1
    # final mask: outlier pixels get the claimed model's id, or (when no
    # spawn/redetect happens) a sentinel id that belongs to NO model — the
    # reference keeps nextModelID in fullSegmentation even without a spawn,
    # excluding those pixels from every model's odometry and fusion
    outlier_id = jnp.int32(n_slots + 1)
    mask = jnp.where(
        seg_res.new_label_mask,
        jnp.where(claim, new_id.astype(jnp.int32), outlier_id),
        seg_res.mask,
    )

    # per-slot max-depth clamp from the segment's depth statistics
    # (setMaxDepth(depthMean + 1.2 * depthStd), MultiMotionFusion.cpp:408)
    seg_maxd = jnp.minimum(
        seg_res.depth_mean + 1.2 * seg_res.depth_std,
        jnp.float32(scfg.depth_cutoff),
    )
    slot_maxd = seg_maxd[1 : 1 + n_slots]
    # SPAWN band: symmetric 5 cm floor on BOTH sides (the sigma-clipped
    # second pass can collapse std to ~0 on a flat fronto-parallel segment;
    # without the floor new_maxd ~= mean drops half the object's pixels)
    new_maxd = jnp.minimum(
        seg_res.depth_mean[1 + n_slots]
        + jnp.maximum(1.2 * seg_res.depth_std[1 + n_slots], 0.05),
        jnp.float32(scfg.depth_cutoff),
    )
    # symmetric LOWER bound for the SPAWN backprojection (the reference only
    # clamps far, :408; near outliers are rare there, but our CRF-scale mask
    # upsample can include near-foreground bleed): a new model is built only
    # from pixels inside the segment's own depth band
    new_mind = jnp.maximum(
        seg_res.depth_mean[1 + n_slots]
        - jnp.maximum(1.2 * seg_res.depth_std[1 + n_slots], 0.05),
        0.0,
    )

    # ---- track <-> segment association (MultiMotionFusion.cpp:585-604) ----
    tracks = _associate_tracks(tracks, mask, time, h, w)
    if use_segm_tracker:
        tracks_segm = _associate_tracks(tracks_segm, mask, time, h, w)

    # ---- back-date the new object's trajectory (Model::refineTrackSubset,
    # Model.cpp:649-737): per-step rigid fits over the new model's track
    # history produce relative transforms the host composes into pre-spawn
    # poses for the export log
    refine_len = min(8, tracks.history - 2)
    rng, rkey = jax.random.split(rng)

    def do_refine(k):
        sel = tracks.model_id == new_id
        T_steps, _ = tracker.refine_track_subset(
            tracks, sel, time, refine_len, k, cfg.ransac
        )
        return T_steps

    def no_refine(k):
        return jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (refine_len, 4, 4)
        )

    refine_T = jax.lax.cond(spawn, do_refine, no_refine, rkey)

    # ---- spawn: initialise the claimed slot from the new-label pixels -----
    # fusion weight (global), hoisted above the spawn so ONE
    # compute_frame_surfels serves both consumers — the spawn variant only
    # differs by its fixed weight 100 (MultiMotionFusion.cpp:569), a scale
    # on the CONF channel
    diff = new_pose0 @ se3.inverse_T(prev_pose)
    motion = jnp.maximum(
        jnp.linalg.norm(diff[:3, 3]), jnp.linalg.norm(se3.so3_log(diff[:3, :3]))
    )
    weighting = (
        jnp.maximum(1.0 - jnp.minimum(motion, 0.01) / 0.01, 0.5) * weight_multiplier
    )
    fs_w = sm.compute_frame_surfels(
        rgb, vmap_raw, vmap_f, nmap_f, cam, time, scfg.depth_cutoff, weighting
    )
    spawn_conf_scale = 100.0 / jnp.maximum(weighting, 1e-6)
    spawn_valid = (
        fs_w.valid & (mask == new_id).reshape(-1) & spawn
        & (fs_w.data[sm.PZ] <= new_maxd)
        & (fs_w.data[sm.PZ] >= new_mind)
    )
    is_spawn_slot = (jnp.arange(n_slots) == target_slot) & spawn
    is_red_slot = (jnp.arange(n_slots) == target_slot) & any_red

    # the 307200-surfel compaction scatter only matters on a spawn frame;
    # lax.cond skips its ~2.5 ms on every other frame
    def _mk_spawn(_):
        sdat = jnp.where(spawn_valid[None], fs_w.data, 0.0)
        sdat = sdat.at[sm.CONF].mul(spawn_conf_scale)
        m_ = sm.init_from_frame(
            sm.FrameSurfels(data=sdat, valid=spawn_valid), cfg.object_capacity
        )
        return m_.data, m_.count

    def _no_spawn(_):
        return jnp.zeros_like(obj.data[0]), jnp.zeros((), jnp.int32)

    spawn_data, spawn_count = jax.lax.cond(spawn, _mk_spawn, _no_spawn, None)
    obj_data = jnp.where(
        is_spawn_slot[:, None, None], spawn_data[None], obj.data
    )
    obj_count = jnp.where(is_spawn_slot, spawn_count, obj.count)
    # `reactivate`: an inactive slot whose EXTERNAL mask id reappeared
    # (precomputed mode only) resumes with its retained map
    obj_active = obj.active | is_spawn_slot | is_red_slot | reactivate
    obj_stored = obj.stored & ~is_spawn_slot & ~is_red_slot
    obj_ext_id = jnp.where(
        is_spawn_slot | is_red_slot, new_ext_id, obj.ext_id
    )
    # spawned models start at identity; redetected ones adopt the RANSAC pose
    # (maps camera points onto the stored model frame, Model::activate)
    obj_pose = jnp.where(
        is_spawn_slot[:, None, None],
        jnp.eye(4, dtype=jnp.float32)[None],
        jnp.where(is_red_slot[:, None, None], red_T[red_slot][None], obj_poses_new),
    )
    obj_spawn_tick = jnp.where(is_spawn_slot | is_red_slot, time, obj.spawn_tick)
    # object-model confidence maturation (MultiMotionFusion.cpp:615-620):
    # raise each ACTIVE slot's render/clean confidence gate towards its
    # segment's average predicted confidence (capped at 9); claimed slots
    # restart at the base object gate ('-confO').
    avg_conf = seg_conf_sum / jnp.maximum(seg_conf_cnt, 1.0)
    conf_t = jnp.where(
        obj.active & (seg_conf_cnt > 0),
        jnp.minimum(jnp.maximum(obj.conf_t, avg_conf), 9.0),
        obj.conf_t,
    )
    conf_t = jnp.where(
        is_spawn_slot | is_red_slot,
        jnp.float32(scfg.object_conf_threshold),
        conf_t,
    )
    # the band may DROP freely but RISES at most 5 cm/frame (1.5 m/s at
    # 30 Hz — generous for a rigid object receding from the camera): ONE
    # transiently wrong segment (e.g. the garbage-flow frame when an object
    # leaves the scene hands its slot a background-majority claim) would
    # otherwise jump the band onto the background, background would fuse
    # into the object's map next frame, and the contaminated model could
    # then claim background forever (reprojection fit ~ 1)
    max_depth = jnp.where(
        obj.active & (seg_res.pixel_counts[1 : 1 + n_slots] > 0),
        jnp.minimum(slot_maxd, obj.max_depth + 0.05),
        obj.max_depth,
    )
    # REACTIVATED slots (precomputed-mask dormancy) adopt their segment's
    # band immediately — the object was free to move while inactive, so the
    # stale band + 5 cm/frame rise would reject its pixels for many frames
    max_depth = jnp.where(reactivate, slot_maxd, max_depth)
    max_depth = jnp.where(is_spawn_slot | is_red_slot, new_maxd, max_depth)

    # ---- lost models (zero segment pixels; MultiMotionFusion.cpp:606-613) -
    slot_px = seg_res.pixel_counts[1 : 1 + n_slots]
    just_claimed = is_spawn_slot | is_red_slot
    unseen = jnp.where(
        obj_active & (slot_px == 0) & ~just_claimed, obj.unseen + 1,
        jnp.zeros_like(obj.unseen),
    )
    was_active = obj_active
    obj_active = obj_active & (unseen < cfg.model_unseen_patience)
    dying = was_active & ~obj_active

    # ---- snapshot dying models for redetection (Model::store) -------------
    # keep-on-deactivate gates (inactivateModel, MultiMotionFusion.cpp:962-981:
    # >= 500 surfels and confidence > 0.3): junk models are dropped, not stored
    bo = obj.data.shape[2]
    alive_cnt = jax.vmap(lambda d: jnp.sum((d[sm.ALIVE] > 0).astype(jnp.int32)))(
        obj_data[:, :, :bo]
    )
    mean_conf = jax.vmap(
        lambda d: jnp.sum(jnp.where(d[sm.ALIVE] > 0, d[sm.CONF], 0.0))
    )(obj_data[:, :, :bo]) / jnp.maximum(alive_cnt.astype(jnp.float32), 1.0)
    keep_gate = (alive_cnt >= cfg.min_inactive_surfels) & (mean_conf > 0.3)
    store_it = dying & keep_gate

    # descriptor/point snapshots are only consumed on a store event; lax.cond
    # skips the per-slot track gathers on every frame with no dying model
    def _do_snap(_):
        return _snapshot_tracks(obj, tracks, obj_pose)

    def _no_snap(_):
        return (
            jnp.zeros_like(obj.stored_desc),
            jnp.zeros_like(obj.stored_p3d),
            jnp.zeros_like(obj.stored_valid),
        )

    snap_d, snap_p, snap_v = jax.lax.cond(
        jnp.any(store_it), _do_snap, _no_snap, None
    )
    obj_stored = obj_stored | store_it
    stored_desc = jnp.where(store_it[:, None, None], snap_d, obj.stored_desc)
    stored_p3d = jnp.where(store_it[:, None, None], snap_p, obj.stored_p3d)
    stored_valid = jnp.where(store_it[:, None], snap_v, obj.stored_valid)

    return LifecycleOut(
        mask=mask, spawn=spawn, any_red=any_red, target_slot=target_slot,
        claim=claim, new_id=new_id, refine_T=refine_T, fs_w=fs_w,
        weighting=weighting,
        is_spawn_slot=is_spawn_slot, is_red_slot=is_red_slot,
        obj_data=obj_data, obj_count=obj_count, obj_pose=obj_pose,
        obj_active=obj_active, obj_stored=obj_stored,
        obj_spawn_tick=obj_spawn_tick, obj_ext_id=obj_ext_id,
        conf_t=conf_t, max_depth=max_depth, new_maxd=new_maxd, unseen=unseen,
        stored_desc=stored_desc, stored_p3d=stored_p3d,
        stored_valid=stored_valid,
        tracks=tracks, tracks_segm=tracks_segm,
        last_spawn=jnp.where(claim, jnp.int32(time), last_spawn),
        rng=rng,
    )


@functools.partial(
    jax.jit, static_argnames=("cam", "cfg", "bucket_fuse", "bucket_obj")
)
def multi_frame_step(
    state: MultiState,
    rgb_u8,
    depth_raw,
    uv,
    time,
    weight_multiplier,
    sp_params,
    cam: CameraModel,
    cfg: EngineConfig,
    bucket_fuse: int,
    ext_mask=None,  # [H, W] int32 user-provided mask ("precomputed" mode)
    bucket_obj: int | None = None,
):
    """One jitted multi-model frame (tick > 1): track all models, segment,
    spawn/deactivate, fuse, predict — composite passes (module docstring)."""
    if cfg.segmentation.mode == "crf":
        # legacy CoFusion CRF needs per-model error images -> per-slot path
        return _multi_frame_step_legacy(
            state, rgb_u8, depth_raw, uv, time, weight_multiplier, sp_params,
            cam, cfg, bucket_fuse, ext_mask,
        )
    from multimotionfusion_tpu.engine import (
        _compact_pred, _detect_keypoints_level, _fern_cam, _ferns_update,
        _frame_inputs,
    )

    scfg = cfg.surfels
    n_slots = state.objects.num_slots
    n_models = 1 + n_slots
    h, w = cam.height, cam.width
    Bg = bucket_fuse
    Bo = bucket_obj if bucket_obj is not None else cfg.object_capacity
    rgb, depth_filt, vmap_raw, vmap_f, nmap_f = _frame_inputs(
        rgb_u8, depth_raw, cam, cfg, uv
    )
    mask_prev = state.prev_mask
    frame_pyr = lv.build_frame_pyramids(depth_filt, rgb, mask_prev, cfg.odometry)
    intensity = frame_pyr.intensity[0]

    # ---- keypoints + tracks ------------------------------------------------
    tracks = state.tracks
    rng = state.rng
    kps = _detect_keypoints_level(
        frame_pyr.intensity, cfg.odometry.init_lvl, cfg, sp_params
    )
    kcfg = cfg.keypoints
    tracks = tracker.add_keypoints(tracks, kps, depth_filt, time, cam, kcfg)
    tracks = tracker.prune(tracks, time, kcfg)
    # segm-level tracker (see MultiState.tracks_segm): its coarser detection
    # grid yields longer-lived tracks under motion; ONLY segmentation
    # velocities read it (MultiMotionFusion.cpp:148)
    use_segm_tracker = cfg.odometry.segm_lvl != cfg.odometry.init_lvl
    if use_segm_tracker:
        kps_s = _detect_keypoints_level(
            frame_pyr.intensity, cfg.odometry.segm_lvl, cfg, sp_params
        )
        tracks_segm = tracker.add_keypoints(
            state.tracks_segm, kps_s, depth_filt, time, cam, kcfg
        )
        tracks_segm = tracker.prune(tracks_segm, time, kcfg)
    else:
        tracks_segm = state.tracks_segm

    # ---- pose seeds (global + slots) ---------------------------------------
    obj = state.objects
    pose0 = state.pose
    if cfg.odom_init == "kp":
        pose0_seed, seed_ok0, rng = _kp_seed(
            tracks, time, tracks.model_id == 0, pose0, rng, cfg, True
        )
        obj_seeds, obj_seed_ok, rng = _seed_slots(obj, tracks, time, rng, cfg)
        T_init_all = jnp.concatenate([pose0_seed[None], obj_seeds], axis=0)
        seed_valid_all = jnp.concatenate([seed_ok0[None], obj_seed_ok])
    else:
        T_init_all = None
        seed_valid_all = None

    # ---- COMPOSITE tracking: one GN pass for all models --------------------
    # prediction = state.filled (owner-composite rendered last frame at the
    # mask that is now prev_mask); per-pixel owner = prev_mask pyramid
    odo_cfg = dataclasses.replace(cfg.odometry, mask_icp=False)
    levels = lv.build_level_data(
        frame_pyr,
        state.filled.vertex_conf[..., :3],
        state.filled.normal_rad[..., :3],
        imops.rgb_to_intensity(state.filled.color),
        cam, odo_cfg, 0,
    )
    T_prev_all = jnp.concatenate([pose0[None], obj.pose], axis=0)
    active_all = jnp.concatenate([jnp.array([True]), obj.active])
    modo = modo_mod.multi_incremental_transformation(
        T_prev_all, levels, state.last_intensity_coarse, odo_cfg, cam,
        n_models, T_init=T_init_all, seed_valid=seed_valid_all,
        active=active_all, pred_own=state.pred_own,
    )
    new_pose0 = modo.poses[0]
    obj_poses_new = modo.poses[1:]

    # ---- global-model lost detection + fern relocalisation (reloc mode) ----
    # same mechanism as the static path (MultiMotionFusion.cpp:629-695)
    bad_count = state.bad_track_count
    lost = state.lost
    if cfg.reloc_mode:
        cov = jnp.linalg.inv(modo.A[0] + jnp.eye(6, dtype=jnp.float32) * 1e-12)
        bad = (jnp.max(jnp.diagonal(cov)) > 1e-4) | (modo.icp_count[0] < 100)
        bad_count = jnp.where(bad, bad_count + 1, 0)
        lost = lost | (bad_count > 10)
        ferns_db, new_pose0, relocalised = _ferns_update(
            state.ferns, rgb, vmap_f, nmap_f, new_pose0, time, lost, cam, cfg
        )
        lost = lost & ~relocalised
        bad_count = jnp.where(relocalised, 0, bad_count)
    else:
        ferns_db = state.ferns

    # ---- global loop closure (closeLoops, MultiMotionFusion.cpp:679-789) --
    # the reference closes loops for the GLOBAL model regardless of how many
    # object models exist; fern retrieval + embedded-deformation map
    # correction runs BEFORE fusion so the corrected map/pose receive this
    # frame's data (reference order: closeLoops :679, fuse :791)
    smap_in = state.smap
    match_log = state.pose_matches
    if cfg.close_loops:
        f = cfg.ferns.factor
        cam_s = _fern_cam(cam, f)
        rgb_s, vmap_s, nmap_s = ferns_mod.downsample_frame(
            rgb, vmap_f, nmap_f, f
        )
        smap_in, new_pose0, match = loop_closure.attempt(
            ferns_db, smap_in, new_pose0, rgb_s, vmap_s, nmap_s, time, cam_s,
            cfg,
        )
        match_log = loop_closure.log_append(match_log, match)
        if not cfg.reloc_mode:  # reloc mode already inserts keyframes above
            ferns_db, _ = ferns_mod.add_frame(
                ferns_db, rgb_s, vmap_s, nmap_s, new_pose0, time,
                cfg.ferns.encoding_threshold,
            )

    # ---- flat camera-frame surfels at the NEW poses (pre-spawn) ------------
    sub = smap_in.bucketed(Bg)
    obj_db = obj.data[:, :, :Bo]
    g_local = sm.transform_surfels(sub.data, se3.inverse_T(new_pose0))
    o_local = jax.vmap(
        lambda d, p: sm.transform_surfels(d, se3.inverse_T(p))
    )(obj_db, obj_poses_new)
    seg_model = jnp.concatenate(
        [
            jnp.zeros((Bg,), jnp.int32),
            jnp.arange(n_slots * Bo, dtype=jnp.int32) // Bo + 1,
        ]
    )
    galive = sub.alive_mask()
    oalive = jax.vmap(
        lambda d, c: (jnp.arange(Bo, dtype=jnp.int32) < c) & (d[sm.ALIVE] > 0)
    )(obj_db, obj.count)
    conf_all = jnp.concatenate(
        [jnp.array([scfg.conf_threshold], jnp.float32), obj.conf_t]
    )
    maxd_all = jnp.concatenate(
        [jnp.array([scfg.depth_cutoff], jnp.float32), obj.max_depth]
    )

    # ---- segmentation -------------------------------------------------------
    poses_prev = jnp.concatenate([state.pose[None], obj.pose], axis=0)
    poses_new = jnp.concatenate([new_pose0[None], obj_poses_new], axis=0)
    tseg = tracks_segm if use_segm_tracker else tracks
    vel, pair_valid = _track_velocities(tseg, time, poses_prev, poses_new, cam)
    s1 = jnp.mod(time, tseg.history)
    txy = tseg.xy[:, s1]
    model_active = jnp.concatenate([jnp.array([True]), obj.active])
    allow_new = cfg.enable_model_spawning and cfg.object_slots > 0
    reactivate = jnp.zeros((n_slots,), bool)
    new_ext_id = jnp.zeros((), jnp.int32)
    if cfg.segmentation.mode == "precomputed":
        # external-mask passthrough (Segmentation.cpp:89-147): no CRF at all
        from multimotionfusion_tpu.segmentation import precomputed as pc

        xm = ext_mask if ext_mask is not None else jnp.zeros((h, w), jnp.int32)
        pres = pc.precomputed_segmentation(
            xm, obj.ext_id, obj.active, depth_filt,
            cfg.segmentation.min_mask_size_px,
        )
        reactivate = pres.reactivate
        new_ext_id = pres.new_ext_id
        pdm, pds = _depth_stats(
            pres.mask, pres.new_label_mask, depth_filt, 1 + n_slots
        )
        seg_res = seg.SegmentationResult(
            mask=pres.mask,
            new_label_mask=pres.new_label_mask,
            has_new_label=pres.has_new_label,
            pixel_counts=pres.pixel_counts,
            depth_mean=pdm,
            depth_std=pds,
            flow=jnp.zeros((cam.height // 4, cam.width // 4, 2), jnp.float32),
        )
    else:
        # per-model depth at CRF scale for the reprojection term: one offset
        # scatter over ALL surfels instead of M full-res splat passes.
        # (A round-5 variant derived this from the composite index map's
        # winner depth instead — per-model block-min, no scatter, -5 ms/frame
        # — and was REVERTED: a model only covers cells it WINS in the
        # composite z-test, and the coverage loss at object/stale-copy
        # overlaps shifted the five-mover claim margins enough to flip the
        # lifecycle battery.) Both
        # segments are stride-subsampled (scatter-min cost is ~7 ns/update —
        # updates price it, not bins; tools/microbench_scatter2.py): at 1/4
        # resolution each CRF cell covers 16 full-res pixels (>= ~16 fused
        # surfels of a mature map), so a stride-8 GLOBAL segment still gives
        # ~2 depth candidates per cell and a stride-2 object segment keeps
        # young movers' footprints dense (their area drives spawning). Depth
        # bias from the thinner min is bounded by surface sampling noise
        # (< 1 cm) — far below sigma_depth (3 cm). Strides go through
        # _stride_cols: a reshape, NOT a strided slice (which lowers to a
        # 40x-costlier gather).
        gs = _RMD_GLOBAL_STRIDE
        os_ = _RMD_OBJECT_STRIDE
        o_flat = jnp.moveaxis(o_local, 0, 1).reshape(sm.CHANNELS, -1)
        flat_rmd = jnp.concatenate(
            [_stride_cols(g_local, gs), _stride_cols(o_flat, os_)], axis=1,
        )
        alive_rmd = jnp.concatenate(
            [_stride_cols(galive, gs), _stride_cols(oalive.reshape(-1), os_)]
        )
        n_obj_rmd = (n_slots * Bo + os_ - 1) // os_
        # slot id from the ORIGINAL index (strided element j came from j*os_):
        # exact for any stride, divisor of Bo or not
        seg_model_rmd = jnp.concatenate(
            [
                jnp.zeros((g_local.shape[1] + gs - 1) // gs, jnp.int32),
                (jnp.arange(n_obj_rmd, dtype=jnp.int32) * os_) // Bo + 1,
            ]
        )
        cam_c = _crf_camera(cam, cfg.segmentation.scale)
        # NO confidence gate here (zeros, not conf_all): this render answers
        # "does any model explain the observed depth?", for which young
        # low-confidence surfels are evidence too. Gating by the render
        # threshold (~10, reached after ~10 sightings) leaves an early map
        # predicting only its confident subset — measured as ~10 cm self-
        # misprediction over a third of the image in a 9-frame-old session,
        # which the outlier class then harvests into phantom segments.
        pred_depth_c = rasterize.render_model_depths(
            flat_rmd, alive_rmd, seg_model_rmd,
            jnp.zeros((n_models,), jnp.float32), maxd_all, n_models,
            cam_c, time, scfg.time_delta,
        )
        seg_res = seg.flow_crf_segmentation(
            state.prev_intensity, intensity, depth_filt, pred_depth_c,
            model_active, txy, vel, pair_valid, cam, cfg.segmentation,
            allow_new=allow_new, pred_at_crf_scale=True,
        )

    # ---- lifecycle: redetect / spawn / deactivate / store (shared helper) --
    # conf maturation source: the OWNER pixels' winner confidence from last
    # frame's composite prediction (MultiMotionFusion.cpp:615-620)
    seg_conf_sum = jax.vmap(
        lambda k: jnp.sum(
            jnp.where(
                (seg_res.mask == k + 1) & (mask_prev == k + 1),
                state.filled.vertex_conf[..., 3], 0.0,
            )
        )
    )(jnp.arange(n_slots, dtype=jnp.int32))
    seg_conf_cnt = jax.vmap(
        lambda k: jnp.sum(
            ((seg_res.mask == k + 1) & (mask_prev == k + 1)).astype(jnp.float32)
        )
    )(jnp.arange(n_slots, dtype=jnp.int32))
    lc = _lifecycle_update(
        obj, seg_res, tracks, tracks_segm, use_segm_tracker, kps, depth_filt,
        rgb, vmap_raw, vmap_f, nmap_f, new_pose0, state.prev_pose,
        obj_poses_new, time, state.last_spawn, weight_multiplier,
        seg_conf_sum, seg_conf_cnt, reactivate, new_ext_id, rng, cam, cfg,
    )
    (mask, spawn, any_red, target_slot, claim, refine_T, fs_w) = (
        lc.mask, lc.spawn, lc.any_red, lc.target_slot, lc.claim, lc.refine_T,
        lc.fs_w,
    )
    tracks, tracks_segm, rng = lc.tracks, lc.tracks_segm, lc.rng
    obj_data, obj_count, obj_pose = lc.obj_data, lc.obj_count, lc.obj_pose
    obj_active, conf_t, max_depth = lc.obj_active, lc.conf_t, lc.max_depth
    unseen = lc.unseen

    # ---- composite render at FINAL poses/data -> fuse -> clean -> predict --
    # post-spawn data/pose differ from the pre-segmentation transform ONLY at
    # the claimed slot (spawned/redetected); re-transform just that slot and
    # patch it in instead of re-running the full [S, C, Bo] transform
    obj_db2 = obj_data[:, :, :Bo]
    claim_data = jnp.take(obj_db2, target_slot, axis=0)  # [C, Bo]
    claim_local = sm.transform_surfels(
        claim_data, se3.inverse_T(jnp.take(obj_pose, target_slot, axis=0))
    )
    is_claim = (jnp.arange(n_slots) == target_slot) & claim
    o_local2 = jnp.where(is_claim[:, None, None], claim_local[None], o_local)
    flat_local2 = jnp.concatenate(
        [g_local, jnp.moveaxis(o_local2, 0, 1).reshape(sm.CHANNELS, -1)],
        axis=1,
    )
    claim_alive = (
        jnp.arange(Bo, dtype=jnp.int32)
        < jnp.take(obj_count, target_slot, axis=0)
    ) & (claim_data[sm.ALIVE] > 0)
    oalive2 = jnp.where(is_claim[:, None], claim_alive[None], oalive)
    alive_flat2 = jnp.concatenate([galive, oalive2.reshape(-1)])
    conf_all2 = jnp.concatenate(
        [jnp.array([scfg.conf_threshold], jnp.float32), conf_t]
    )
    maxd_all2 = jnp.concatenate(
        [jnp.array([scfg.depth_cutoff], jnp.float32), max_depth]
    )
    active_all2 = jnp.concatenate([jnp.array([True]), obj_active])
    poses_all2 = jnp.concatenate([new_pose0[None], obj_pose], axis=0)

    im = rasterize.predict_indices_flat(
        flat_local2, alive_flat2, seg_model, maxd_all2, n_models, cam,
        time, scfg.time_delta,
    )
    attrs = rasterize.gather_attr_images(im.data_local, im.index)

    seg_bases = tuple(
        [0, Bg] + [Bg + (k + 1) * Bo for k in range(n_slots)]
    )
    # per-pixel model of the winning surfel: consumers gate candidates by it
    # (fuse: must match the pixel's mask owner; clean/resolve: within-model)
    win_model = rasterize.win_model_image(im.index, seg_bases, n_models)
    storage_flat = jnp.concatenate(
        [sub.data, jnp.moveaxis(obj_db2, 0, 1).reshape(sm.CHANNELS, -1)],
        axis=1,
    )
    counts_all = jnp.concatenate([sub.count[None], obj_count])
    fused_flat, counts_new = fusion.fuse_flat(
        storage_flat, counts_all, seg_bases, fs_w, im, mask, poses_all2,
        maxd_all2, active_all2, cam, time, scfg, attrs, win_model,
    )
    pos_in_seg = jnp.concatenate(
        [
            jnp.arange(Bg, dtype=jnp.int32),
            jnp.tile(jnp.arange(Bo, dtype=jnp.int32), n_slots),
        ]
    )
    count_per_surfel = rasterize.take_small(counts_new, seg_model, n_models)
    alive_pf = (pos_in_seg < count_per_surfel) & (fused_flat[sm.ALIVE] > 0)
    cleaned_flat = fusion.clean_flat(
        fused_flat, counts_new, seg_model, alive_pf, im, depth_filt,
        conf_all2, cam, time, scfg.time_delta, scfg, attrs, win_model,
    )
    if cfg.reloc_mode:
        # global fusion is skipped while lost (MultiMotionFusion.cpp:791)
        cleaned_flat = cleaned_flat.at[:, :Bg].set(
            jnp.where(lost, sub.data, cleaned_flat[:, :Bg])
        )
        counts_new = counts_new.at[0].set(
            jnp.where(lost, sub.count, counts_new[0])
        )

    # periodic per-segment repack (see fusion.clean's compact rationale)
    def _packed(args):
        data_flat, counts = args
        keepg = (
            (jnp.arange(Bg, dtype=jnp.int32) < counts[0])
            & (data_flat[sm.ALIVE, :Bg] > 0)
        )
        gpack, gcnt = sm.compact(data_flat[:, :Bg], keepg, Bg)
        oseg = jnp.moveaxis(
            data_flat[:, Bg:].reshape(sm.CHANNELS, n_slots, Bo), 1, 0
        )
        okeep = jax.vmap(
            lambda d, c: (jnp.arange(Bo, dtype=jnp.int32) < c)
            & (d[sm.ALIVE] > 0)
        )(oseg, counts[1:])
        opack, ocnt = jax.vmap(lambda d, k: sm.compact(d, k, Bo))(oseg, okeep)
        out = jnp.concatenate(
            [gpack, jnp.moveaxis(opack, 0, 1).reshape(sm.CHANNELS, -1)],
            axis=1,
        )
        return out, jnp.concatenate([gcnt[None], ocnt])

    def _flagged(args):
        return args

    compact = _compact_pred(time, scfg)
    if isinstance(compact, bool):
        cleaned_flat, counts_new = (
            _packed((cleaned_flat, counts_new)) if compact
            else (cleaned_flat, counts_new)
        )
    else:
        cleaned_flat, counts_new = jax.lax.cond(
            compact, _packed, _flagged, (cleaned_flat, counts_new)
        )

    # split storage back out
    gdata = state.smap.data.at[:, :Bg].set(cleaned_flat[:, :Bg])
    smap = sm.SurfelMap(data=gdata, count=counts_new[0])
    obj_data_out = obj_data.at[:, :, :Bo].set(
        jnp.moveaxis(
            cleaned_flat[:, Bg:].reshape(sm.CHANNELS, n_slots, Bo), 1, 0
        )
    )
    obj_count_out = counts_new[1:]

    # ---- composite prediction for the NEXT frame's tracking ----------------
    # per-candidate confidence gate = the WINNER's model's gate; tap owner
    # gating keeps the ray-disk resolve within one model's surfels
    conf_px = rasterize.take_small(conf_all2, win_model, n_models)
    pred = rasterize.splat_resolve(
        im, cam, 0.0, time, time, scfg.time_delta, scfg.splat_footprint,
        attrs=attrs, conf_img=conf_px, own_img=win_model,
    )
    conf_img = sm.pixel_confidence(cam, 1.0)
    rad_img = sm.radius_from_depth(vmap_f[..., 2], nmap_f[..., 2], cam)
    filled = fill_in(
        pred, rgb, vmap_f, nmap_f, conf_img, rad_img, cfg.frame_to_frame_rgb,
        gate=mask == 0,
    )

    objects = ObjectSlots(
        data=obj_data_out, count=obj_count_out, pose=obj_pose,
        active=obj_active, unseen=unseen, spawn_tick=lc.obj_spawn_tick,
        conf_t=conf_t, max_depth=max_depth,
        stored=lc.obj_stored, stored_desc=lc.stored_desc,
        stored_p3d=lc.stored_p3d,
        stored_valid=lc.stored_valid, ext_id=lc.obj_ext_id,
    )

    coarse = frame_pyr.intensity[cfg.odometry.num_pyr - 1]
    stats = jnp.concatenate(
        [
            jnp.stack(
                [
                    modo.icp_error[0], modo.icp_count[0],
                    modo.rgb_error[0], modo.rgb_count[0],
                    smap.alive_count().astype(jnp.float32),
                    smap.count.astype(jnp.float32),
                    spawn.astype(jnp.float32),
                    jnp.sum(obj_active.astype(jnp.float32)),
                    lost.astype(jnp.float32),
                ]
            ),
            seg_res.pixel_counts.astype(jnp.float32),
        ]
    )
    new_state = MultiState(
        smap=smap, pose=new_pose0, prev_pose=state.pose, filled=filled,
        pred_own=win_model,
        last_intensity_coarse=coarse, tracks=tracks,
        tracks_segm=tracks_segm, rng=rng, objects=objects,
        prev_mask=mask, prev_intensity=intensity,
        last_spawn=lc.last_spawn,
        ferns=ferns_db, bad_track_count=bad_count, lost=lost,
        pose_matches=match_log,
    )
    aux = SpawnAux(
        spawn=spawn, redetect=any_red, slot=target_slot, refine_T=refine_T
    )
    return new_state, stats, mask, aux


def _multi_frame_step_legacy(
    state: MultiState,
    rgb_u8,
    depth_raw,
    uv,
    time,
    weight_multiplier,
    sp_params,
    cam: CameraModel,
    cfg: EngineConfig,
    bucket_fuse: int,
    ext_mask=None,
):
    """Round-2 per-slot multi-model path, kept for the legacy CoFusion CRF
    ("crf" mode): it consumes per-model ICP error images over the WHOLE image
    (Segmentation.cpp:212-332), which the owner-composite passes cannot
    produce. Per-slot predictions are re-rendered in-step (the composite
    state no longer carries [S, H, W] prediction images)."""
    from multimotionfusion_tpu.engine import (
        _compact_pred, _detect_keypoints_level, _ferns_update, _frame_inputs,
    )
    from multimotionfusion_tpu.segmentation import legacy_crf

    scfg = cfg.surfels
    n_slots = state.objects.num_slots
    h, w = cam.height, cam.width
    rgb, depth_filt, vmap_raw, vmap_f, nmap_f = _frame_inputs(
        rgb_u8, depth_raw, cam, cfg, uv
    )
    mask_prev = state.prev_mask
    frame_pyr = lv.build_frame_pyramids(depth_filt, rgb, mask_prev, cfg.odometry)
    intensity = frame_pyr.intensity[0]

    tracks = state.tracks
    rng = state.rng
    kps = _detect_keypoints_level(
        frame_pyr.intensity, cfg.odometry.init_lvl, cfg, sp_params
    )
    kcfg = cfg.keypoints
    tracks = tracker.add_keypoints(tracks, kps, depth_filt, time, cam, kcfg)
    tracks = tracker.prune(tracks, time, kcfg)
    # the legacy CRF has no velocity unaries, but the segm-level table still
    # advances so '-segm_mode crf' runs keep it consistent
    use_segm_tracker = cfg.odometry.segm_lvl != cfg.odometry.init_lvl
    if use_segm_tracker:
        kps_s = _detect_keypoints_level(
            frame_pyr.intensity, cfg.odometry.segm_lvl, cfg, sp_params
        )
        tracks_segm = tracker.prune(
            tracker.add_keypoints(
                state.tracks_segm, kps_s, depth_filt, time, cam, kcfg
            ),
            time, kcfg,
        )
    else:
        tracks_segm = state.tracks_segm

    obj = state.objects

    # ---- per-slot predictions at the PREVIOUS poses (replaces the state-
    # carried prediction images of the round-2 design; the maps and poses are
    # unchanged since the end of the previous frame, so this reproduces them)
    def render_slot(data, count, pose, conf_t, max_depth):
        omap = sm.SurfelMap(data=data, count=count)
        pred = rasterize.splat_predict(
            omap, pose, cam, conf_t, time - 1, time - 1, scfg.time_delta,
            max_depth, scfg.splat_footprint,
        )
        return pred.vertex_conf, pred.normal_rad, pred.color

    opvc, opnr, opcol = jax.vmap(render_slot)(
        obj.data, obj.count, obj.pose, obj.conf_t, obj.max_depth
    )

    # ---- global model: kp init + masked dense refinement -------------------
    pose0 = state.pose
    if cfg.odom_init == "kp":
        pose0_seed, seed_ok0, rng = _kp_seed(
            tracks, time, tracks.model_id == 0, pose0, rng, cfg, True
        )
    else:
        pose0_seed = pose0
        seed_ok0 = None
    levels0 = lv.build_level_data(
        frame_pyr,
        state.filled.vertex_conf[..., :3],
        state.filled.normal_rad[..., :3],
        imops.rgb_to_intensity(state.filled.color),
        cam, cfg.odometry, 0,
    )
    seeded = cfg.odom_init == "kp"
    odo0 = rgbd.get_incremental_transformation(
        state.pose, levels0, state.last_intensity_coarse, cfg.odometry, cam, 0,
        T_init=pose0_seed if seeded else None, seeded=seeded,
        seed_valid=seed_ok0 if seeded else None,
    )
    new_pose0 = odo0.pose

    from multimotionfusion_tpu.engine import _ferns_update as _fu

    bad_count = state.bad_track_count
    lost = state.lost
    if cfg.reloc_mode:
        cov = jnp.linalg.inv(odo0.A + jnp.eye(6, dtype=jnp.float32) * 1e-12)
        bad = (jnp.max(jnp.diagonal(cov)) > 1e-4) | (odo0.icp_count < 100)
        bad_count = jnp.where(bad, bad_count + 1, 0)
        lost = lost | (bad_count > 10)
        ferns_db, new_pose0, relocalised = _fu(
            state.ferns, rgb, vmap_f, nmap_f, new_pose0, time, lost, cam, cfg
        )
        lost = lost & ~relocalised
        bad_count = jnp.where(relocalised, 0, bad_count)
    else:
        ferns_db = state.ferns

    # ---- object models: per-slot kp init + masked dense refinement ---------
    if cfg.odom_init == "kp":
        obj_seeds, obj_seed_ok, rng = _seed_slots(obj, tracks, time, rng, cfg)
    else:
        obj_seeds = obj.pose
        obj_seed_ok = jnp.zeros((n_slots,), bool)

    def track_one(slot_idx, slot_pose, seed_pose, seed_ok, pvc, pnr, pcol):
        levels = lv.build_level_data(
            frame_pyr, pvc[..., :3], pnr[..., :3],
            imops.rgb_to_intensity(pcol), cam, cfg.odometry,
            slot_idx + 1,
        )
        odo = rgbd.get_incremental_transformation(
            slot_pose, levels, state.last_intensity_coarse, cfg.odometry, cam,
            slot_idx + 1, T_init=seed_pose, seeded=True, seed_valid=seed_ok,
        )
        return odo.pose, odo.icp_count, odo.icp_error_image

    obj_poses_new, obj_icp_counts, obj_icp_imgs = jax.vmap(track_one)(
        jnp.arange(n_slots, dtype=jnp.int32), obj.pose, obj_seeds, obj_seed_ok,
        opvc, opnr, opcol,
    )
    obj_poses_new = jnp.where(obj.active[:, None, None], obj_poses_new, obj.pose)

    # ---- per-model prediction at the NEWLY tracked poses --------------------
    sub = state.smap.bucketed(bucket_fuse)
    im0 = rasterize.predict_indices(
        sub, new_pose0, cam, time, scfg.time_delta, scfg.depth_cutoff
    )
    attrs0 = rasterize.gather_attr_images(im0.data_local, im0.index)
    pred0 = rasterize.splat_resolve(
        im0, cam, scfg.conf_threshold, time, time, scfg.time_delta,
        scfg.splat_footprint, attrs=attrs0,
    )

    def predict_one(data, count, pose, conf_t, max_depth):
        omap = sm.SurfelMap(data=data, count=count)
        im = rasterize.predict_indices(
            omap, pose, cam, time, scfg.time_delta, max_depth
        )
        at = rasterize.gather_attr_images(im.data_local, im.index)
        pred = rasterize.splat_resolve(
            im, cam, conf_t, time, time, scfg.time_delta,
            scfg.splat_footprint, attrs=at,
        )
        return im.index, im.data_local, at, pred

    oidx, odl, oattrs, opred = jax.vmap(predict_one)(
        obj.data, obj.count, obj_poses_new, obj.conf_t, obj.max_depth
    )

    # ---- legacy CRF segmentation -------------------------------------------
    poses_prev = jnp.concatenate([state.pose[None], obj.pose], axis=0)
    poses_new = jnp.concatenate([new_pose0[None], obj_poses_new], axis=0)
    model_active = jnp.concatenate([jnp.array([True]), obj.active])
    allow_new = cfg.enable_model_spawning and cfg.object_slots > 0

    icp_imgs = jnp.concatenate(
        [odo0.icp_error_image[None], obj_icp_imgs], axis=0
    )
    conf_imgs = jnp.concatenate(
        [
            state.filled.vertex_conf[None, ..., 3],
            opvc[..., 3],
        ],
        axis=0,
    )
    lres = legacy_crf.legacy_crf_segmentation(
        rgb, depth_filt, icp_imgs, conf_imgs, model_active,
        cfg.segmentation, allow_new=allow_new,
    )
    m_all = 1 + n_slots
    ldm, lds = _depth_stats(lres.mask, lres.new_label_mask, depth_filt, m_all)
    seg_res = seg.SegmentationResult(
        mask=lres.mask,
        new_label_mask=lres.new_label_mask,
        has_new_label=lres.has_new_label,
        pixel_counts=lres.pixel_counts,
        depth_mean=ldm,
        depth_std=lds,
        flow=jnp.zeros((cam.height // 4, cam.width // 4, 2), jnp.float32),
    )

    # ---- lifecycle (shared helper; see _lifecycle_update) -------------------
    # conf maturation source: the slot's own prediction images (the legacy
    # path renders per-slot, so no owner-composite is available)
    seg_conf_sum = jax.vmap(
        lambda k: jnp.sum(
            jnp.where(seg_res.mask == k + 1, opvc[k, ..., 3], 0.0)
        )
    )(jnp.arange(n_slots, dtype=jnp.int32))
    seg_conf_cnt = jax.vmap(
        lambda k: jnp.sum((seg_res.mask == k + 1).astype(jnp.float32))
    )(jnp.arange(n_slots, dtype=jnp.int32))
    lc = _lifecycle_update(
        obj, seg_res, tracks, tracks_segm, use_segm_tracker, kps, depth_filt,
        rgb, vmap_raw, vmap_f, nmap_f, new_pose0, state.prev_pose,
        obj_poses_new, time, state.last_spawn, weight_multiplier,
        seg_conf_sum, seg_conf_cnt,
        jnp.zeros((n_slots,), bool), jnp.zeros((), jnp.int32), rng, cam, cfg,
    )
    (mask, spawn, any_red, target_slot, claim, refine_T, fs_w) = (
        lc.mask, lc.spawn, lc.any_red, lc.target_slot, lc.claim, lc.refine_T,
        lc.fs_w,
    )
    tracks, tracks_segm, rng = lc.tracks, lc.tracks_segm, lc.rng
    obj_data, obj_count, obj_pose = lc.obj_data, lc.obj_count, lc.obj_pose
    obj_active, conf_t, max_depth = lc.obj_active, lc.conf_t, lc.max_depth
    unseen = lc.unseen

    def _repredict(_):
        return predict_one(
            obj_data[target_slot], obj_count[target_slot],
            obj_pose[target_slot],
            jnp.float32(scfg.object_conf_threshold),
            lc.new_maxd,
        )

    def _keep(_):
        return (
            oidx[target_slot], odl[target_slot], oattrs[target_slot],
            jax.tree_util.tree_map(lambda x: x[target_slot], opred),
        )

    cl_idx, cl_dl, cl_attrs, cl_pred = jax.lax.cond(claim, _repredict, _keep, None)
    is_claim = (jnp.arange(n_slots) == target_slot) & claim
    oidx = jnp.where(is_claim[:, None, None], cl_idx[None], oidx)
    odl = jnp.where(is_claim[:, None, None], cl_dl[None], odl)
    oattrs = jnp.where(is_claim[:, None, None, None], cl_attrs[None], oattrs)
    opred = jax.tree_util.tree_map(
        lambda full, one: jnp.where(
            is_claim.reshape((-1,) + (1,) * (full.ndim - 1)), one[None], full
        ),
        opred, cl_pred,
    )

    fused0 = fusion.fuse(
        sub, fs_w, im0, mask, 0, new_pose0, cam, time, scfg, attrs=attrs0
    )
    cleaned0 = fusion.clean(
        fused0, im0, depth_filt, mask, 0, new_pose0, cam,
        time, scfg.time_delta, scfg.conf_threshold, scfg, attrs=attrs0,
        compact=_compact_pred(time, scfg),
    )
    if cfg.reloc_mode:
        cleaned0 = sm.SurfelMap(
            data=jnp.where(lost, sub.data, cleaned0.data),
            count=jnp.where(lost, sub.count, cleaned0.count),
        )
    gdata = state.smap.data.at[:, :bucket_fuse].set(cleaned0.data)
    smap = sm.SurfelMap(data=gdata, count=cleaned0.count)
    conf_img = sm.pixel_confidence(cam, 1.0)
    rad_img = sm.radius_from_depth(vmap_f[..., 2], nmap_f[..., 2], cam)
    filled = fill_in(
        pred0, rgb, vmap_f, nmap_f, conf_img, rad_img, cfg.frame_to_frame_rgb
    )

    def fuse_one(slot_idx, data, count, pose, active, idx, dl, attrs,
                 conf_gate, max_depth):
        omap = sm.SurfelMap(data=data, count=count)
        mask_id = slot_idx + 1
        im = rasterize.IndexMap(index=idx, data_local=dl)
        fs_slot = sm.FrameSurfels(
            data=fs_w.data, valid=fs_w.valid & (fs_w.data[sm.PZ] <= max_depth)
        )
        fused = fusion.fuse(
            omap, fs_slot, im, mask, mask_id, pose, cam, time, scfg, attrs=attrs
        )
        cleaned = fusion.clean(
            fused, im, depth_filt, mask, mask_id, pose, cam,
            time, scfg.time_delta, conf_gate, scfg,
            attrs=attrs, compact=_compact_pred(time, scfg),
        )
        out_data = jnp.where(active, cleaned.data, data)
        out_count = jnp.where(active, cleaned.count, count)
        return out_data, out_count

    odata, ocount = jax.vmap(fuse_one)(
        jnp.arange(n_slots, dtype=jnp.int32), obj_data, obj_count, obj_pose,
        obj_active, oidx, odl, oattrs, conf_t, max_depth,
    )
    objects = ObjectSlots(
        data=odata, count=ocount, pose=obj_pose, active=obj_active,
        unseen=unseen, spawn_tick=lc.obj_spawn_tick, conf_t=conf_t,
        max_depth=max_depth,
        stored=lc.obj_stored, stored_desc=lc.stored_desc,
        stored_p3d=lc.stored_p3d,
        stored_valid=lc.stored_valid, ext_id=obj.ext_id,
    )

    coarse = frame_pyr.intensity[cfg.odometry.num_pyr - 1]
    stats = jnp.concatenate(
        [
            jnp.stack(
                [
                    odo0.icp_error, odo0.icp_count,
                    odo0.rgb_error, odo0.rgb_count,
                    smap.alive_count().astype(jnp.float32),
                    smap.count.astype(jnp.float32),
                    spawn.astype(jnp.float32),
                    jnp.sum(obj_active.astype(jnp.float32)),
                    lost.astype(jnp.float32),
                ]
            ),
            seg_res.pixel_counts.astype(jnp.float32),
        ]
    )
    new_state = MultiState(
        smap=smap, pose=new_pose0, prev_pose=state.pose, filled=filled,
        pred_own=jnp.zeros((h, w), jnp.int32),  # unused by the legacy path
        last_intensity_coarse=coarse, tracks=tracks,
        tracks_segm=tracks_segm, rng=rng, objects=objects,
        prev_mask=mask, prev_intensity=intensity,
        last_spawn=lc.last_spawn,
        ferns=ferns_db, bad_track_count=bad_count, lost=lost,
        pose_matches=state.pose_matches,
    )
    aux = SpawnAux(
        spawn=spawn, redetect=any_red, slot=target_slot, refine_T=refine_T
    )
    return new_state, stats, mask, aux


@functools.partial(
    jax.jit, static_argnames=("cam", "cfg", "bucket_fuse", "bucket_obj")
)
def multi_frame_steps_batch(
    state: MultiState,
    rgbs,
    depths,
    uvs,
    time0,
    weight_multiplier,
    sp_params,
    cam: CameraModel,
    cfg: EngineConfig,
    bucket_fuse: int,
    bucket_obj: int | None = None,
):
    """k multi-model frames in ONE device dispatch via lax.scan.

    Same amortisation as the static-mode _frame_steps_batch: on a remote
    (tunnelled) backend each executable launch costs a host round-trip
    comparable to the device step, so scanning k frames inside one
    executable amortises it k-fold. The multi-model step takes no per-frame
    host input outside precomputed-mask mode (lifecycle is in-graph), so the
    scan is semantically identical to k single steps. Per-frame lifecycle
    records (object poses, active masks, spawn aux) AND per-frame
    segmentation masks come back stacked for lazy host expansion.
    """

    def body(carry, inp):
        st, t = carry
        rgb_u8, depth_raw, uv = inp
        st2, stats, mask, aux = multi_frame_step(
            st, rgb_u8, depth_raw, uv, t, weight_multiplier, sp_params,
            cam, cfg, bucket_fuse, bucket_obj=bucket_obj,
        )
        out = (
            stats, st2.pose, st2.objects.pose, st2.objects.active,
            aux.spawn, aux.slot, aux.refine_T, mask.astype(jnp.uint8),
        )
        return (st2, t + 1), out

    # carry slimming (see engine._frame_steps_batch): the global surfel array
    # enters at bucket size and the fern keyframe store is hoisted out when
    # reloc is off — lax.scan double-buffers its carry, so anything big and
    # pass-through in it costs a per-frame copy
    full_data = state.smap.data
    hoist_ferns = not (cfg.reloc_mode or cfg.close_loops)
    real_ferns = state.ferns
    state = state._replace(smap=state.smap.bucketed(bucket_fuse))
    if hoist_ferns:
        state = state._replace(ferns=ferns_mod.stub(real_ferns))

    if uvs is None:
        def body_nouv(carry, inp):
            rgb_u8, depth_raw = inp
            return body(carry, (rgb_u8, depth_raw, None))

        (state, _), outs = jax.lax.scan(body_nouv, (state, time0), (rgbs, depths))
    else:
        (state, _), outs = jax.lax.scan(body, (state, time0), (rgbs, depths, uvs))
    state = state._replace(
        smap=sm.SurfelMap(
            data=full_data.at[:, :bucket_fuse].set(state.smap.data),
            count=state.smap.count,
        )
    )
    if hoist_ferns:
        state = state._replace(ferns=real_ferns)
    (stats, poses, obj_poses, obj_active, spawns, slots, refine_Ts,
     masks) = outs
    return (state, stats, poses, obj_poses, obj_active, spawns, slots,
            refine_Ts, masks)
