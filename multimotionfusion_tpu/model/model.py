"""Per-rigid-body model: surfel map + pose + tracking state.

TPU counterpart of reference Core/Model/Model.{h,cpp}. Where the reference
Model owns GL buffers, CUDA pyramids and an RGBDOdometry instance, this Model
owns a SurfelMap pytree, the latest prediction (splat + fill-in) and the pose
history; all per-frame device work is delegated to jitted free functions so
state stays a plain pytree and the class is orchestration only (host-side
decisions mirror the reference's CPU control flow, SURVEY.md §7).

Pose convention matches the reference: ``pose`` maps model/camera frame ->
global frame (Model.h getPose). For the global model (id 0) this is the camera
pose; object models premultiply their own rigid motion.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimotionfusion_tpu.config import CameraModel, EngineConfig
from multimotionfusion_tpu.model import fusion, surfel_map as sm
from multimotionfusion_tpu.model.fillin import FilledMaps, fill_in
from multimotionfusion_tpu.odometry import levels as lv
from multimotionfusion_tpu.odometry import rgbd
from multimotionfusion_tpu.ops import maps as mapops
from multimotionfusion_tpu.ops import rasterize
from multimotionfusion_tpu.utils import se3


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "capacity"))
def _init_map(
    rgb, depth_raw, depth_filt, time, cam: CameraModel, cfg: EngineConfig, capacity: int
):
    vmap_raw = mapops.create_vmap(depth_raw, cam, cfg.surfels.depth_cutoff)
    vmap_f = mapops.create_vmap(depth_filt, cam, cfg.surfels.depth_cutoff)
    nmap_f = mapops.create_nmap(vmap_f)
    fs = sm.compute_frame_surfels(
        rgb, vmap_raw, vmap_f, nmap_f, cam, time, cfg.surfels.depth_cutoff, 1.0
    )
    return sm.init_from_frame(fs, capacity)


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "bucket"))
def _fuse_clean(
    smap: sm.SurfelMap,
    pose,
    rgb,
    depth_raw,
    depth_filt,
    mask,
    mask_id,
    time,
    weighting,
    cam: CameraModel,
    cfg: EngineConfig,
    bucket: int,
):
    """fuse + clean (MultiMotionFusion.cpp:791-817), bucketed to the live size.

    Perf deviations from the reference, both documented in fusion.py: the
    clean pass reuses the pre-fuse index map instead of re-rendering it after
    fuse (the reference renders twice; the only difference is that surfels
    merged/appended THIS tick are judged by their pre-merge attributes — they
    are one tick old and cannot be culled by any of the tests anyway), and
    storage is only repacked by the occasional maintenance compaction.
    """
    scfg = cfg.surfels
    sub = smap.bucketed(bucket)
    vmap_raw = mapops.create_vmap(depth_raw, cam, scfg.depth_cutoff)
    vmap_f = mapops.create_vmap(depth_filt, cam, scfg.depth_cutoff)
    nmap_f = mapops.create_nmap(vmap_f)
    fs = sm.compute_frame_surfels(
        rgb, vmap_raw, vmap_f, nmap_f, cam, time, scfg.depth_cutoff, weighting
    )
    im = rasterize.predict_indices(
        sub, pose, cam, time, scfg.time_delta, scfg.depth_cutoff
    )
    fused = fusion.fuse(sub, fs, im, mask, mask_id, pose, cam, time, scfg)
    cleaned = fusion.clean(
        fused, im, depth_filt, mask, mask_id, pose, cam,
        time, scfg.time_delta, scfg.conf_threshold, scfg,
    )
    data = smap.data.at[:, :bucket].set(cleaned.data)
    return sm.SurfelMap(data=data, count=cleaned.count)


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "bucket"))
def _predict_fillin(
    smap: sm.SurfelMap,
    pose,
    rgb,
    depth_filt,
    time,
    max_time,
    cam: CameraModel,
    cfg: EngineConfig,
    bucket: int,
    passthrough=False,
):
    """combinedPredict(ACTIVE) + performFillIn (MultiMotionFusion.cpp:863-875)."""
    scfg = cfg.surfels
    pred = rasterize.splat_predict(
        smap.bucketed(bucket), pose, cam, scfg.conf_threshold, time, max_time,
        scfg.time_delta, scfg.depth_cutoff, scfg.splat_footprint,
    )
    vmap_f = mapops.create_vmap(depth_filt, cam, scfg.depth_cutoff)
    nmap_f = mapops.create_nmap(vmap_f)
    conf = sm.pixel_confidence(cam, 1.0)
    rad = sm.radius_from_depth(vmap_f[..., 2], nmap_f[..., 2], cam)
    return pred, fill_in(pred, rgb, vmap_f, nmap_f, conf, rad, passthrough)


def _bucket_for(n: int, capacity: int, floor: int = 1 << 15) -> int:
    """Smallest work bucket >= n (host-side; one jit cache per size).

    Buckets are powers of two up to 2^18, then a x1.5 geometric ladder
    (384k, 576k, 864k, capacity): per-surfel scatter cost is linear in the
    bucket, so finer rungs save device time, but EVERY rung crossed during a
    live run costs a full recompile of the frame program (tens of seconds
    through a tunnelled backend). The engine pre-compiles the next rung in a
    background thread (see MultiMotionFusionTPU._prewarm_next_bucket), which
    makes crossings stall-free — the ladder only has to bound the wasted
    scatter work (<= 1.5x) and the number of compiles per session (~4 above
    256k for a 1M-surfel map).
    """
    b = floor
    while b < n and b < (1 << 18):
        b <<= 1
    while b < n:
        b += b >> 1
    return min(b, capacity)


class Model:
    """One rigid body (reference Core/Model/Model.h:75-409)."""

    def __init__(self, model_id: int, cfg: EngineConfig, capacity: Optional[int] = None):
        self.id = model_id
        self.cfg = cfg
        self.capacity = capacity or cfg.surfels.max_surfels
        self.smap = sm.empty(self.capacity)
        self.hwm = 0  # host mirror of smap.count (high-water mark)
        self.pose = jnp.eye(4, dtype=jnp.float32)
        self.pose_log: List[Tuple[int, np.ndarray]] = []  # (timestamp, pose 4x4)
        self.filled: Optional[FilledMaps] = None  # prediction for next tracking
        self.pred: Optional[rasterize.PredictedMaps] = None
        self.last_odometry: Optional[rgbd.OdometryResult] = None
        self.unseen_count = 0
        self.age = 0  # frames since creation

    def _sync_hwm(self):
        self.hwm = int(self.smap.count)
        if self.hwm > 0.95 * self.capacity:
            self.smap = fusion.compact_map(self.smap)
            self.hwm = int(self.smap.count)

    # -- lifecycle ---------------------------------------------------------

    def initialise(self, rgb, depth_raw, depth_filt, time: int, cam: CameraModel):
        self.smap = _init_map(
            rgb, depth_raw, depth_filt, time, cam, self.cfg, self.capacity
        )
        self._sync_hwm()

    def last_transform(self) -> jnp.ndarray:
        """Relative motion over the last frame (Model::getLastTransform)."""
        if len(self.pose_log) < 2:
            return jnp.eye(4, dtype=jnp.float32)
        prev = jnp.asarray(self.pose_log[-2][1])
        return jnp.asarray(self.pose_log[-1][1]) @ se3.inverse_T(prev)

    def compute_fusion_weight(self, weight_multiplier: float) -> float:
        """Velocity-based fusion down-weighting (Model.cpp:876-891)."""
        diff = self.last_transform()
        trans = float(jnp.linalg.norm(diff[:3, 3]))
        rot = float(jnp.linalg.norm(se3.so3_log(diff[:3, :3])))
        largest = 0.01
        w = min(max(trans, rot), largest)
        return max(1.0 - w / largest, 0.5) * weight_multiplier

    # -- per-frame stages --------------------------------------------------

    def track(
        self,
        frame_pyr: lv.FramePyramids,
        last_intensity_l2,
        cam: CameraModel,
        mask_id=0,
    ) -> rgbd.OdometryResult:
        """Dense ICP+RGB refinement against the last prediction
        (Model::performTracking, Model.cpp:409-433)."""
        assert self.filled is not None, "track() requires a prior predict()"
        pred_v = self.filled.vertex_conf[..., :3]
        pred_n = self.filled.normal_rad[..., :3]
        pred_i = mapops_intensity(self.filled.color)
        levels = lv.build_level_data(
            frame_pyr, pred_v, pred_n, pred_i, cam,
            self.cfg.odometry, mask_id,
        )
        result = rgbd.get_incremental_transformation(
            self.pose, levels, last_intensity_l2, self.cfg.odometry, cam, mask_id
        )
        self.pose = result.pose
        self.last_odometry = result
        return result

    def fuse_clean(
        self, rgb, depth_raw, depth_filt, mask, time: int,
        cam: CameraModel, weight_multiplier: float = 1.0,
    ):
        w = self.compute_fusion_weight(weight_multiplier)
        # headroom for this frame's appends: at most 1/4 of the pixels
        # participate (checkerboard gate in fuse)
        n_pix = cam.width * cam.height
        bucket = _bucket_for(self.hwm + n_pix // 4 + 1, self.capacity)
        self.smap = _fuse_clean(
            self.smap, self.pose, rgb, depth_raw, depth_filt, mask,
            self.id, time, w, cam, self.cfg, bucket,
        )
        self._sync_hwm()

    def predict(self, rgb, depth_filt, time: int, cam: CameraModel, lost=False):
        bucket = _bucket_for(self.hwm, self.capacity)
        self.pred, self.filled = _predict_fillin(
            self.smap, self.pose, rgb, depth_filt,
            0 if lost else time, time, cam, self.cfg, bucket,
            passthrough=self.cfg.frame_to_frame_rgb,
        )

    def append_pose(self, timestamp: int):
        self.pose_log.append((timestamp, np.asarray(self.pose)))

    # -- export ------------------------------------------------------------

    def surfel_count(self) -> int:
        """Number of LIVE surfels (flag-based; hwm counts used slots)."""
        return int(self.smap.alive_count())

    def download(self) -> dict:
        """Host copy of the live surfels (Model::downloadMap, Model.cpp:1353-1384)."""
        d = np.asarray(self.smap.data[:, : max(self.hwm, 1)])
        alive = d[sm.ALIVE] > 0
        d = d[:, alive]
        return {
            "position": d[sm.POS].T,
            "confidence": d[sm.CONF],
            "color": d[sm.COLOR].T,
            "init_time": d[sm.INIT_T],
            "last_time": d[sm.LAST_T],
            "normal": d[sm.NORMAL].T,
            "radius": d[sm.RADIUS],
        }


def mapops_intensity(rgb: jnp.ndarray) -> jnp.ndarray:
    from multimotionfusion_tpu.ops import image as imops

    return imops.rgb_to_intensity(rgb)
