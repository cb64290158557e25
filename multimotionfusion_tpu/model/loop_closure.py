"""Global loop closure: fern retrieval -> surface constraints -> embedded
deformation -> gated map/pose correction.

TPU re-design of the closeLoops path of reference
Core/MultiMotionFusion.cpp:679-789 + Core/Model/Deformation.cpp:76-180:
per frame, retrieve the most similar fern keyframe and align the live frame
against it; on a confident match, build point constraints "surface point at
its CURRENT (drifted) global position must move to its position under the
relocalised pose", optimise the embedded-deformation graph, and — only if the
optimised graph actually satisfies the constraints (accept gates
meanConsErr < accept_cons_err && graph error bounded, Deformation.cpp:135) —
apply the deformation to the map and adopt the relocalised pose. A PoseMatch
record (reference Core/PoseMatch.h) is emitted either way.

NOTE the reference FORK never reaches its acceptance branches (assert(0),
MultiMotionFusion.cpp:703,775 — SURVEY.md §5.4): the mechanism here is the
ElasticFusion behaviour the fork inherited, implemented and tested, and stays
off by default (EngineConfig.close_loops=False) for fork parity.

Everything is jit-inside: the expensive optimisation runs under lax.cond and
is skipped entirely on frames without a fern match.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.config import CameraModel, EngineConfig
from multimotionfusion_tpu.model import deformation as dg
from multimotionfusion_tpu.model import ferns as ferns_mod
from multimotionfusion_tpu.model import surfel_map as sm
from multimotionfusion_tpu.utils import se3


class PoseMatch(NamedTuple):
    """Loop-closure pose pair record (reference Core/PoseMatch.h:1-39)."""

    source_time: jnp.ndarray  # [] int32 keyframe time
    dest_time: jnp.ndarray  # [] int32 live time
    source_pose: jnp.ndarray  # [4,4] drifted pose at match time
    dest_pose: jnp.ndarray  # [4,4] relocalised pose
    accepted: jnp.ndarray  # [] bool — deformation applied
    matched: jnp.ndarray  # [] bool — fern gates passed at all
    mean_cons_err: jnp.ndarray  # [] float32 post-optimisation constraint error


# constraint grid: the reference samples a 20x20 consBuff from the predicted
# vertices (MultiMotionFusion.cpp:751-757); we stride the fern-scale frame
# vertex map to the same density
_CONS_STRIDE = 4


def attempt(
    ferns_db: ferns_mod.FernDB,
    smap: sm.SurfelMap,
    pose: jnp.ndarray,  # [4,4] current (possibly drifted) camera pose
    rgb_s: jnp.ndarray,  # ÷factor downsampled live frame (ferns scale)
    vmap_s: jnp.ndarray,
    nmap_s: jnp.ndarray,
    time,
    cam_s: CameraModel,
    cfg: EngineConfig,
):
    """One loop-closure attempt. Returns (smap, pose, PoseMatch)."""
    r = ferns_mod.find_frame(
        ferns_db, rgb_s, vmap_s, nmap_s, vmap_s[..., 2], cam_s,
        _reloc_odom(cfg), photo_thresh=cfg.ferns.photo_thresh,
    )
    # a self-match against the keyframe just inserted from this very pose is
    # not a loop: require the retrieved keyframe to be old (timeDelta apart,
    # the reference's deforms->fernDeforms distinction)
    old_enough = (time - ferns_db.src_time[r.best]) > cfg.surfels.time_delta
    matched = r.ok & old_enough

    def do_deform(_):
        # constraints from the live frame surface: the map sees this surface
        # at `pose`; the fern alignment says it belongs at r.pose
        pts_cam = vmap_s[::_CONS_STRIDE, ::_CONS_STRIDE].reshape(-1, 3)
        valid = pts_cam[:, 2] > 0
        src = se3.transform_points(pose, pts_cam)
        dst = se3.transform_points(r.pose, pts_cam)
        # constrained points carry the CURRENT time: they anchor to the most
        # recent graph nodes (the drifted end of the trajectory), while old
        # nodes hold the loop's far side in place (Deformation.cpp time gates)
        times = jnp.full((src.shape[0],), jnp.float32(time))

        graph = dg.sample_nodes(smap, cfg.deformation.max_nodes)
        opt = dg.optimise(graph, src, dst, valid, times, cfg.deformation)

        moved = dg.deform_points(
            src, opt.positions, opt.times, opt.A, opt.t, opt.valid,
            cfg.deformation, times,
        )
        n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        cons_err = (
            jnp.sum(jnp.where(valid, jnp.linalg.norm(moved - dst, axis=-1), 0.0))
            / n_valid
        )
        # accept gates (Deformation.cpp:135: meanConsErr < 3e-4 && error <
        # 0.12 — the reference's units are squared metres over its Huber-ish
        # energy; here cons_err is a mean point distance, gated in metres)
        accept = (cons_err < cfg.loop_accept_cons_err) & jnp.all(
            jnp.isfinite(opt.t)
        )

        def apply(_):
            return dg.apply_to_map(smap, opt, cfg.deformation), r.pose

        def keep(_):
            return smap, pose

        new_map, new_pose = jax.lax.cond(accept, apply, keep, None)
        return new_map, new_pose, accept, cons_err

    def no_match(_):
        return smap, pose, jnp.zeros((), bool), jnp.float32(jnp.inf)

    new_map, new_pose, accepted, cons_err = jax.lax.cond(
        matched, do_deform, no_match, None
    )
    match = PoseMatch(
        source_time=ferns_db.src_time[r.best],
        dest_time=jnp.int32(time),
        source_pose=pose,
        dest_pose=r.pose,
        accepted=accepted,
        matched=matched,
        mean_cons_err=cons_err,
    )
    return new_map, new_pose, match


def _reloc_odom(cfg: EngineConfig):
    from multimotionfusion_tpu.config import OdometryConfig

    return OdometryConfig(
        num_pyr=2, iterations=(10, 5), so3_prealign=False,
        mask_icp=False, mask_rgb=False, min_grad_magnitudes=(5.0, 3.0),
    )


class MatchLog(NamedTuple):
    """Device-resident ring buffer of PoseMatch records.

    The reference keeps poseMatches as a host std::vector
    (MultiMotionFusion.h PoseMatch list); a fixed-capacity device log keeps
    the whole frame step jittable and rides the session checkpoint for free.
    """

    times: jnp.ndarray  # [M, 2] int32 (source keyframe time, dest live time)
    poses: jnp.ndarray  # [M, 2, 4, 4] (drifted pose, relocalised pose)
    accepted: jnp.ndarray  # [M] bool
    cons_err: jnp.ndarray  # [M] float32
    count: jnp.ndarray  # [] int32 total matches ever recorded

    @property
    def capacity(self) -> int:
        return self.times.shape[0]


def empty_log(capacity: int = 16) -> MatchLog:
    return MatchLog(
        times=jnp.zeros((capacity, 2), jnp.int32),
        poses=jnp.zeros((capacity, 2, 4, 4), jnp.float32),
        accepted=jnp.zeros((capacity,), bool),
        cons_err=jnp.zeros((capacity,), jnp.float32),
        count=jnp.zeros((), jnp.int32),
    )


def log_append(log: MatchLog, match: PoseMatch) -> MatchLog:
    """Record a match (no-op unless match.matched); ring-buffer overwrite."""
    slot = jnp.where(match.matched, jnp.mod(log.count, log.capacity), log.capacity)
    return MatchLog(
        times=log.times.at[slot].set(
            jnp.stack([match.source_time, match.dest_time]), mode="drop"
        ),
        poses=log.poses.at[slot].set(
            jnp.stack([match.source_pose, match.dest_pose]), mode="drop"
        ),
        accepted=log.accepted.at[slot].set(match.accepted, mode="drop"),
        cons_err=log.cons_err.at[slot].set(match.mean_cons_err, mode="drop"),
        count=log.count + match.matched.astype(jnp.int32),
    )
