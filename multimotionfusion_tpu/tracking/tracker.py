"""Keypoint track table.

TPU re-design of reference tracker::PointTracker (Core/Utils/PointTracker.
{hpp,cpp}): the reference keeps a vector of equally-long tracks where each
frame appends one (possibly null) keypoint per track. Here the table is a
fixed-capacity struct of arrays with a ring-buffer time axis:

- rows = track slots (capacity T), columns = the last H frames (ring);
- a slot is allocated on first detection, deactivated by prune;
- matching is mutual-nearest-neighbour L2 with a distance gate, exactly the
  reference's cross-checked BFMatcher + 0.7 gate (PointTracker.cpp:96-117),
  expressed as one [K, T] distance matmul on the MXU;
- 3D coordinates are back-projected from the depth map at detection time
  (PointTracker.cpp construct_kp), invalid depth -> non-finite flag.

Everything is fixed-shape and jittable; host code never touches per-track
Python objects (the reference's shared_ptr graph).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.config import CameraModel, KeypointConfig
from multimotionfusion_tpu.tracking.superpoint import Keypoints


class TrackTable(NamedTuple):
    xy: jnp.ndarray  # [T, H, 2] pixel coords per ring slot
    p3d: jnp.ndarray  # [T, H, 3] camera-frame points (0 where invalid)
    seen: jnp.ndarray  # [T, H] bool — keypoint present at that ring slot
    has_depth: jnp.ndarray  # [T, H] bool — 3D coordinate is valid
    desc: jnp.ndarray  # [T, D] descriptor of the most recent keypoint
    last_seen: jnp.ndarray  # [T] int32 tick of the last keypoint (-1 = never)
    nvalid: jnp.ndarray  # [T] int32 number of keypoints on the track
    active: jnp.ndarray  # [T] bool slot allocated
    model_id: jnp.ndarray  # [T] int32 owning model (0 = global / unassigned)

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]

    @property
    def history(self) -> int:
        return self.xy.shape[1]


def empty(capacity: int, history: int, desc_dim: int) -> TrackTable:
    return TrackTable(
        xy=jnp.zeros((capacity, history, 2), jnp.float32),
        p3d=jnp.zeros((capacity, history, 3), jnp.float32),
        seen=jnp.zeros((capacity, history), bool),
        has_depth=jnp.zeros((capacity, history), bool),
        desc=jnp.zeros((capacity, desc_dim), jnp.float32),
        last_seen=jnp.full((capacity,), -1, jnp.int32),
        nvalid=jnp.zeros((capacity,), jnp.int32),
        active=jnp.zeros((capacity,), bool),
        model_id=jnp.zeros((capacity,), jnp.int32),
    )


def backproject_keypoints(kps: Keypoints, depth: jnp.ndarray, cam: CameraModel):
    """3D camera-frame coordinates from the depth map (construct_kp)."""
    h, w = depth.shape
    xi = jnp.clip(jnp.rint(kps.xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.rint(kps.xy[:, 1]).astype(jnp.int32), 0, h - 1)
    z = depth[yi, xi]
    has_depth = kps.valid & (z > 0)
    p = jnp.stack(
        [
            z * (kps.xy[:, 0] - cam.cx) / cam.fx,
            z * (kps.xy[:, 1] - cam.cy) / cam.fy,
            z,
        ],
        axis=-1,
    )
    return jnp.where(has_depth[:, None], p, 0.0), has_depth


def mutual_match(
    q_desc: jnp.ndarray,  # [K, D] query (new frame keypoints)
    t_desc: jnp.ndarray,  # [T, D] train (track descriptors)
    q_valid: jnp.ndarray,  # [K]
    t_valid: jnp.ndarray,  # [T]
    max_dist: float,
):
    """Cross-checked nearest-neighbour matching (BFMatcher(NORM_L2, True)).

    Returns (match_idx [K] int32 track per query or -1, matched_t [T] bool).
    One [K, T] distance matrix via a single MXU matmul.
    """
    d2 = (
        jnp.sum(q_desc * q_desc, -1)[:, None]
        - 2.0 * jnp.matmul(q_desc, t_desc.T,
                           precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(t_desc * t_desc, -1)[None, :]
    )
    big = jnp.float32(1e30)
    d2 = jnp.where(q_valid[:, None] & t_valid[None, :], d2, big)
    best_t = jnp.argmin(d2, axis=1)  # [K]
    best_q = jnp.argmin(d2, axis=0)  # [T]
    k_ids = jnp.arange(q_desc.shape[0], dtype=jnp.int32)
    mutual = best_q[best_t] == k_ids
    dist_ok = jnp.take_along_axis(d2, best_t[:, None], 1)[:, 0] <= max_dist**2
    ok = mutual & dist_ok & q_valid
    match_idx = jnp.where(ok, best_t.astype(jnp.int32), -1)
    matched_t = jnp.zeros((t_desc.shape[0],), bool).at[
        jnp.where(ok, best_t, t_desc.shape[0] - 1)
    ].max(ok)
    return match_idx, matched_t


def add_keypoints(
    table: TrackTable,
    kps: Keypoints,
    depth: jnp.ndarray,
    time,  # int32 tick
    cam: CameraModel,
    cfg: KeypointConfig,
) -> TrackTable:
    """Match new keypoints to tracks; append hits, open tracks for misses.

    == PointTracker::addKeypoints (PointTracker.cpp:27-131): candidates are
    tracks with a keypoint within the history window; matched queries extend
    the track, unmatched ones allocate new slots (capacity-capped).
    """
    cap, hist = table.capacity, table.history
    slot = jnp.mod(time, hist)
    p3d, has_depth = backproject_keypoints(kps, depth, cam)

    in_history = table.active & (time - table.last_seen <= hist)
    match_idx, _ = mutual_match(
        kps.desc, table.desc, kps.valid, in_history, cfg.match_dist_gate
    )
    matched = match_idx >= 0

    # --- extend matched tracks (scatter per query) -------------------------
    tgt = jnp.where(matched, match_idx, cap)  # drop misses
    xy = table.xy.at[tgt, slot].set(kps.xy, mode="drop")
    p3d_new = table.p3d.at[tgt, slot].set(p3d, mode="drop")
    seen = table.seen.at[tgt, slot].set(True, mode="drop")
    hdep = table.has_depth.at[tgt, slot].set(has_depth, mode="drop")
    desc = table.desc.at[tgt].set(kps.desc, mode="drop")
    last_seen = table.last_seen.at[tgt].set(time, mode="drop")
    nvalid = table.nvalid.at[tgt].add(1, mode="drop")

    # --- new tracks for unmatched keypoints (prefix-sum allocation) --------
    new_mask = kps.valid & ~matched
    free = ~table.active
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank of each free slot
    want_rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1  # per new kp
    # free slot index for the r-th new keypoint
    slot_of_rank = jnp.full((cap + 1,), cap, jnp.int32).at[
        jnp.where(free, free_rank, cap)
    ].min(jnp.arange(cap, dtype=jnp.int32))
    new_tgt = jnp.where(new_mask, slot_of_rank[jnp.clip(want_rank, 0, cap)], cap)

    xy = xy.at[new_tgt, slot].set(kps.xy, mode="drop")
    p3d_new = p3d_new.at[new_tgt, slot].set(p3d, mode="drop")
    seen = seen.at[new_tgt, slot].set(True, mode="drop")
    hdep = hdep.at[new_tgt, slot].set(has_depth, mode="drop")
    desc = desc.at[new_tgt].set(kps.desc, mode="drop")
    last_seen = last_seen.at[new_tgt].set(time, mode="drop")
    nvalid = nvalid.at[new_tgt].set(1, mode="drop")
    active = table.active.at[new_tgt].set(True, mode="drop")

    # --- clear the NEXT ring slot (it will be overwritten a full cycle on) --
    nxt = jnp.mod(time + 1, hist)
    seen = seen.at[:, nxt].set(False)
    hdep = hdep.at[:, nxt].set(False)

    return TrackTable(
        xy=xy, p3d=p3d_new, seen=seen, has_depth=hdep, desc=desc,
        last_seen=last_seen, nvalid=nvalid, active=active,
        model_id=table.model_id,
    )


def prune(table: TrackTable, time, cfg: KeypointConfig, fps: float = 30.0) -> TrackTable:
    """Deactivate short, stale tracks (PointTracker::prune:170-203)."""
    stale = (time - table.last_seen) > jnp.int32(cfg.prune_max_age_s * fps)
    drop = table.active & (table.nvalid < cfg.prune_min_kps) & stale
    return table._replace(active=table.active & ~drop)


def pair_between(table: TrackTable, t_a, t_b):
    """(p_a, p_b, valid): per-track 3D points at two ticks within the ring.

    Valid when both ring slots hold an observation with depth AND the slots
    have not been overwritten (ticks within `history` of each other and of
    the track's last update)."""
    hist = table.history
    sa = jnp.mod(t_a, hist)
    sb = jnp.mod(t_b, hist)
    pa = table.p3d[:, sa]
    pb = table.p3d[:, sb]
    fresh = (table.last_seen - t_a < hist) & (table.last_seen - t_b < hist)
    valid = (
        table.active
        & table.seen[:, sa] & table.seen[:, sb]
        & table.has_depth[:, sa] & table.has_depth[:, sb]
        & fresh
    )
    return pa, pb, valid


def refine_track_subset(
    table: TrackTable,
    model_sel: jnp.ndarray,  # [T] bool — the model's tracks
    time,
    length: int,
    rng,
    ransac_cfg,
):
    """Back-date a new model's trajectory by per-step rigid fits over its
    track history (Model::refineTrackSubset, Model.cpp:649-737).

    Returns [length, 4, 4] relative transforms T_k with
    p(time-k-1) ~ T_k p(time-k), identity where the fit fails."""
    from multimotionfusion_tpu.ops import ransac as ransac_ops

    out = []
    for k in range(length):
        p1, p0_prev = time - k, time - k - 1
        pa, pb, valid = pair_between(table, p0_prev, p1)
        valid = valid & model_sel
        rng, sub = jax.random.split(rng)
        res = ransac_ops.ransac_fit(sub, pa, pb, valid, ransac_cfg)
        ok = res.ok & jnp.all(jnp.isfinite(res.transform)) & (
            jnp.sum(valid.astype(jnp.int32)) >= 3
        )
        out.append(jnp.where(ok, res.transform, jnp.eye(4, dtype=jnp.float32)))
    return jnp.stack(out), rng


def last_pair(table: TrackTable, time) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(p0, p1, valid): 3D points of each track at ticks time-1 and time.

    == the correspondence set of Model::getLastTrackTransform
    (Model.cpp:739-779): both keypoints present with valid depth.
    """
    hist = table.history
    s1 = jnp.mod(time, hist)
    s0 = jnp.mod(time - 1, hist)
    p0 = table.p3d[:, s0]
    p1 = table.p3d[:, s1]
    valid = (
        table.active
        & table.has_depth[:, s0]
        & table.has_depth[:, s1]
        & (table.last_seen == time)
    )
    return p0, p1, valid
