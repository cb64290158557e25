"""Fern keyframe database for global loop closure / relocalisation.

TPU re-design of reference Core/Ferns.{h,cpp}: random ferns encode heavily
downsampled (÷8) RGB-D keyframes; insertion is gated on dissimilarity to the
closest stored frame, retrieval returns the most similar keyframe, and
relocalisation aligns the live frame against it with the dense solver plus a
photometric verification (Ferns::findFrame, Ferns.cpp:145-308).

Encoding (Ferns.cpp:95-105): each fern is a pixel plus four thresholds; the
4-bit code is (r>tr)<<3 | (g>tg)<<2 | (b>tb)<<1 | (depth_mm>td), 255 where
the vertex is invalid. The reference's per-code co-occurrence lists (a
pointer-heavy inverted index) become a dense [K, F] code table — one
vectorised comparison against all keyframes replaces the index walk.

The database is a fixed-capacity pytree living on device; insertion is a
conditional scatter, so the whole add/find path sits inside the jitted frame
step. The reference seeds its ferns from time(0) (Ferns.cpp:46); here the
seed is explicit (SURVEY.md §7 determinism note).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.config import CameraModel, FernConfig, OdometryConfig
from multimotionfusion_tpu.odometry import levels as lv
from multimotionfusion_tpu.odometry import rgbd
from multimotionfusion_tpu.ops import image as imops
from multimotionfusion_tpu.ops import maps as mapops

BAD_CODE = jnp.uint8(255)


class FernDB(NamedTuple):
    fern_pos: jnp.ndarray  # [F, 2] int32 (x, y) at the ÷factor resolution
    fern_thresh: jnp.ndarray  # [F, 4] float32 (r, g, b, depth_mm)
    codes: jnp.ndarray  # [K, F] uint8
    poses: jnp.ndarray  # [K, 4, 4]
    src_time: jnp.ndarray  # [K] int32
    rgb: jnp.ndarray  # [K, h, w, 3] float32 0..255
    vmap: jnp.ndarray  # [K, h, w, 3] camera-frame vertices
    nmap: jnp.ndarray  # [K, h, w, 3]
    count: jnp.ndarray  # [] int32

    @property
    def capacity(self) -> int:
        return self.codes.shape[0]


def create(
    cfg: FernConfig, cam: CameraModel, capacity: int | None = None, seed: int = 0
) -> FernDB:
    """Generate the fern conservatory + an empty keyframe store
    (Ferns::generateFerns; capacity defaults to cfg.num_ferns=500 keyframes,
    matching the reference's -fs default, MultiMotionFusion.cpp:33)."""
    capacity = capacity or cfg.num_ferns
    h = cam.height // cfg.factor
    w = cam.width // cfg.factor
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pos = jnp.stack(
        [
            jax.random.randint(k1, (cfg.num_ferns,), 0, w),
            jax.random.randint(k2, (cfg.num_ferns,), 0, h),
        ],
        axis=-1,
    ).astype(jnp.int32)
    rgb_t = jax.random.uniform(k3, (cfg.num_ferns, 3), minval=0.0, maxval=255.0)
    d_t = jax.random.uniform(
        k4, (cfg.num_ferns, 1), minval=400.0, maxval=cfg.max_depth * 1000.0
    )
    thresh = jnp.concatenate([rgb_t, d_t], axis=-1)
    return FernDB(
        fern_pos=pos,
        fern_thresh=thresh,
        codes=jnp.full((capacity, cfg.num_ferns), BAD_CODE, jnp.uint8),
        poses=jnp.zeros((capacity, 4, 4)),
        src_time=jnp.zeros((capacity,), jnp.int32),
        rgb=jnp.zeros((capacity, h, w, 3)),
        vmap=jnp.zeros((capacity, h, w, 3)),
        nmap=jnp.zeros((capacity, h, w, 3)),
        count=jnp.zeros((), jnp.int32),
    )


def stub(db: FernDB) -> FernDB:
    """Zero-capacity placeholder sharing the fern conservatory fields.

    Used to hoist the (tens-of-MB) keyframe store out of lax.scan carries
    when relocalisation / loop closure is disabled: the frame step then only
    passes the DB through, but a scan would still copy the carry every
    iteration (~3 ms/frame measured for 500 keyframes at 80x60)."""

    def z(a):
        return jnp.zeros((0,) + a.shape[1:], a.dtype)

    return db._replace(
        codes=z(db.codes), poses=z(db.poses), src_time=z(db.src_time),
        rgb=z(db.rgb), vmap=z(db.vmap), nmap=z(db.nmap),
    )


def downsample_frame(rgb, vmap, nmap, factor: int):
    """÷factor nearest downsample (the reference's GPUResize)."""
    return (
        rgb[factor // 2 :: factor, factor // 2 :: factor],
        vmap[factor // 2 :: factor, factor // 2 :: factor],
        nmap[factor // 2 :: factor, factor // 2 :: factor],
    )


def encode(db: FernDB, rgb_s: jnp.ndarray, vmap_s: jnp.ndarray) -> jnp.ndarray:
    """[F] uint8 fern codes of a downsampled frame (Ferns.cpp:95-105)."""
    x = db.fern_pos[:, 0]
    y = db.fern_pos[:, 1]
    pix = rgb_s[y, x]  # [F, 3]
    z = vmap_s[y, x, 2]  # [F]
    code = (
        ((pix[:, 0] > db.fern_thresh[:, 0]).astype(jnp.uint8) << 3)
        | ((pix[:, 1] > db.fern_thresh[:, 1]).astype(jnp.uint8) << 2)
        | ((pix[:, 2] > db.fern_thresh[:, 2]).astype(jnp.uint8) << 1)
        | ((z * 1000.0).astype(jnp.int32) > db.fern_thresh[:, 3].astype(jnp.int32)).astype(jnp.uint8)
    )
    return jnp.where(z > 0, code, BAD_CODE)


def block_hd(db: FernDB, codes: jnp.ndarray) -> jnp.ndarray:
    """[K] similarity = fraction of matching valid fern codes per keyframe
    (the reference's co-occurrence count / goodCodes)."""
    valid_q = codes != BAD_CODE
    eq = (db.codes == codes[None]) & valid_q[None] & (db.codes != BAD_CODE)
    good = jnp.maximum(jnp.sum(valid_q.astype(jnp.float32)), 1.0)
    sim = jnp.sum(eq.astype(jnp.float32), axis=1) / good
    in_db = jnp.arange(db.capacity) < db.count
    return jnp.where(in_db, sim, -1.0)


def add_frame(
    db: FernDB,
    rgb_s: jnp.ndarray,
    vmap_s: jnp.ndarray,
    nmap_s: jnp.ndarray,
    pose: jnp.ndarray,
    time,
    threshold: float,
):
    """Insert iff dissimilarity to the closest keyframe exceeds `threshold`
    (Ferns::addFrame). Returns (db, inserted: bool scalar)."""
    codes = encode(db, rgb_s, vmap_s)
    sim = block_hd(db, codes)
    best = jnp.max(sim)
    dissim = 1.0 - jnp.maximum(best, 0.0)
    insert = ((db.count == 0) | (dissim > threshold)) & (db.count < db.capacity)
    slot = jnp.where(insert, db.count, db.capacity)
    new = db._replace(
        codes=db.codes.at[slot].set(codes, mode="drop"),
        poses=db.poses.at[slot].set(pose, mode="drop"),
        src_time=db.src_time.at[slot].set(time, mode="drop"),
        rgb=db.rgb.at[slot].set(rgb_s, mode="drop"),
        vmap=db.vmap.at[slot].set(vmap_s, mode="drop"),
        nmap=db.nmap.at[slot].set(nmap_s, mode="drop"),
        count=db.count + insert.astype(jnp.int32),
    )
    return new, insert


class RelocResult(NamedTuple):
    pose: jnp.ndarray  # [4,4] relocalised camera pose
    ok: jnp.ndarray  # [] bool — all gates passed
    best: jnp.ndarray  # [] int32 keyframe index
    similarity: jnp.ndarray
    icp_error: jnp.ndarray
    photo_error: jnp.ndarray


def find_frame(
    db: FernDB,
    rgb_s: jnp.ndarray,
    vmap_s: jnp.ndarray,
    nmap_s: jnp.ndarray,
    depth_s: jnp.ndarray,
    cam_s: CameraModel,
    odom_cfg: OdometryConfig,
    min_similarity: float = 0.3,
    max_icp_error: float = 3e-4,
    min_icp_count_frac: float = 0.1,
    photo_thresh: float = 115.0,
) -> RelocResult:
    """Retrieve the closest keyframe and align the live frame against it
    (Ferns::findFrame gates, Ferns.cpp:203-263 + photometricCheck :265-308)."""
    codes = encode(db, rgb_s, vmap_s)
    sim = block_hd(db, codes)
    best = jnp.argmax(sim)
    best_sim = sim[best]

    kf_rgb = db.rgb[best]
    kf_vmap = db.vmap[best]
    kf_nmap = db.nmap[best]
    kf_pose = db.poses[best]

    # align: keyframe is the prediction ("last"), live frame is "next"
    frame_pyr = lv.build_frame_pyramids(
        depth_s, rgb_s, jnp.zeros(depth_s.shape, jnp.int32), odom_cfg
    )
    levels = lv.build_level_data(
        frame_pyr, kf_vmap, kf_nmap, imops.rgb_to_intensity(kf_rgb),
        cam_s, odom_cfg, 0,
    )
    coarse = imops.build_pyramid(
        imops.rgb_to_intensity(kf_rgb), odom_cfg.num_pyr
    )[odom_cfg.num_pyr - 1]
    res = rgbd.get_incremental_transformation(
        kf_pose, levels, coarse, odom_cfg, cam_s, 0
    )

    # photometric verification: project keyframe vertices into the live frame
    # with the estimated relative pose, compare intensities
    from multimotionfusion_tpu.utils import se3

    T_rel = se3.inverse_T(res.pose) @ kf_pose  # keyframe cam -> live cam
    pts = se3.transform_points(T_rel, kf_vmap.reshape(-1, 3)).reshape(kf_vmap.shape)
    z = jnp.maximum(pts[..., 2], 1e-6)
    u = pts[..., 0] * cam_s.fx / z + cam_s.cx
    v = pts[..., 1] * cam_s.fy / z + cam_s.cy
    live_i = imops.rgb_to_intensity(rgb_s)
    kf_i = imops.rgb_to_intensity(kf_rgb)
    samp = imops.bilinear_sample(live_i, u, v)
    inb = (
        (u >= 0) & (v >= 0) & (u < cam_s.width - 1) & (v < cam_s.height - 1)
        & (kf_vmap[..., 2] > 0)
    )
    diff = jnp.where(inb, jnp.abs(samp - kf_i), 0.0)
    n_valid = jnp.maximum(jnp.sum(inb.astype(jnp.float32)), 1.0)
    photo_err = jnp.sum(diff) / n_valid

    n_pix = cam_s.width * cam_s.height
    ok = (
        (db.count > 0)
        & (best_sim > min_similarity)
        & (res.icp_error < max_icp_error)
        & (res.icp_count > min_icp_count_frac * n_pix)
        & (photo_err < photo_thresh)
    )
    return RelocResult(
        pose=res.pose, ok=ok, best=best, similarity=best_sim,
        icp_error=res.icp_error, photo_error=photo_err,
    )
