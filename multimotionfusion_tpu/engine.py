"""Top-level engine: the per-frame SLAM pipeline.

TPU counterpart of reference Core/MultiMotionFusion.{h,cpp}. This round covers
the single-model ("-static", ElasticFusion-style) path of processFrame
(MultiMotionFusion.cpp:207-854): upload -> depth filter -> (first frame)
initialise -> track -> fuse -> clean -> predict -> pose logging. Multi-model
segmentation/spawning and the sparse keypoint pipeline layer on top in later
stages (SURVEY.md §7 stages 4-6).

Host/device split: frame-level orchestration and lifecycle decisions run in
Python (as in the reference, where they are CPU control flow); all pixel and
surfel work happens in a handful of jitted programs that exchange pytrees.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimotionfusion_tpu.config import CameraModel, EngineConfig
from multimotionfusion_tpu.io.frame import FrameData
from multimotionfusion_tpu.model.model import Model
from multimotionfusion_tpu.odometry import levels as lv
from multimotionfusion_tpu.ops import image as imops
from multimotionfusion_tpu.utils import se3


@functools.partial(jax.jit, static_argnames=("cfg",))
def _preprocess(rgb_u8, depth_raw, cfg: EngineConfig):
    """Upload-side frame prep (MultiMotionFusion.cpp:259-262, 897-904):
    bilateral depth filter + odometry pyramids."""
    rgb = rgb_u8.astype(jnp.float32)
    depth_filt = imops.bilateral_depth_filter(depth_raw)
    return rgb, depth_filt


class MultiMotionFusionTPU:
    """Engine facade (reference class MultiMotionFusion, Core/MultiMotionFusion.h:54-)."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.cam = cfg.camera
        self.tick = 1
        self.time_delta = cfg.surfels.time_delta
        self.models: List[Model] = [Model(0, cfg)]
        self.last_intensity_coarse: Optional[jnp.ndarray] = None
        self.lost = False
        self.stats: Dict[str, float] = {}

    @property
    def global_model(self) -> Model:
        return self.models[0]

    def process_frame(
        self,
        frame: FrameData,
        gt_pose: Optional[np.ndarray] = None,
        weight_multiplier: float = 1.0,
    ) -> Dict[str, float]:
        cam = self.cam
        rgb_u8 = jnp.asarray(frame.rgb)
        depth_raw = jnp.asarray(frame.depth)
        rgb, depth_filt = _preprocess(rgb_u8, depth_raw, self.cfg)
        mask = (
            jnp.asarray(frame.mask.astype(np.int32))
            if frame.mask is not None
            else jnp.zeros((cam.height, cam.width), jnp.int32)
        )
        frame_pyr = lv.build_frame_pyramids(depth_filt, rgb, mask, self.cfg.odometry)

        gm = self.global_model
        if self.tick == 1:
            if gt_pose is not None:
                gm.pose = jnp.asarray(gt_pose, jnp.float32)
            gm.initialise(rgb, depth_raw, depth_filt, self.tick, cam)
            gm.append_pose(frame.timestamp)
            gm.predict(rgb, depth_filt, self.tick, cam)
        else:
            if self.cfg.odom_init == "tf" and gt_pose is not None:
                gm.pose = jnp.asarray(gt_pose, jnp.float32)
            if self.cfg.icp_refine or self.cfg.odom_init not in ("tf",):
                res = gm.track(frame_pyr, self.last_intensity_coarse, cam, mask_id=0)
                self.stats.update(
                    icp_error=float(res.icp_error),
                    icp_count=float(res.icp_count),
                    rgb_error=float(res.rgb_error),
                )
            gm.fuse_clean(
                rgb, depth_raw, depth_filt, mask, self.tick, cam, weight_multiplier
            )
            gm.predict(rgb, depth_filt, self.tick, cam, lost=self.lost)
            gm.append_pose(frame.timestamp)

        # frame-to-frame reference image for the next SO(3) pre-alignment
        # (RGBDOdometry keeps the previous frame's coarse intensity)
        self.last_intensity_coarse = frame_pyr.intensity[self.cfg.odometry.num_pyr - 1]
        self.tick += 1
        self.stats["surfels"] = gm.surfel_count()
        return dict(self.stats)

    # -- export (MultiMotionFusion::exportPoses/savePly, :1001-1045) -------

    def export_poses(self, export_dir: str) -> List[str]:
        """Write per-model TUM trajectories poses-<id>.txt.

        Camera trajectory = global model poses; object trajectory = P_0 P_m^-1
        (the object's motion in world frame), matching exportPoses
        (MultiMotionFusion.cpp:1020-1045).
        """
        import os

        paths = []
        gposes = {ts: p for ts, p in self.global_model.pose_log}
        for model in self.models:
            path = os.path.join(export_dir, f"poses-{model.id}.txt")
            with open(path, "w") as f:
                for ts, pose in model.pose_log:
                    if model.id == 0:
                        T = pose
                    else:
                        p0 = gposes.get(ts)
                        if p0 is None:
                            continue
                        T = p0 @ np.linalg.inv(pose)
                    q = np.asarray(se3.to_quaternion_xyzw(jnp.asarray(T[:3, :3])))
                    t = T[:3, 3]
                    f.write(
                        f"{ts * 1e-9:.9f} {t[0]} {t[1]} {t[2]} "
                        f"{q[0]} {q[1]} {q[2]} {q[3]}\n"
                    )
            paths.append(path)
        return paths

    def save_ply(self, export_dir: str) -> List[str]:
        import os

        from multimotionfusion_tpu.io import ply

        paths = []
        for model in self.models:
            path = os.path.join(export_dir, f"cloud-{model.id}.ply")
            ply.write_surfel_ply(
                path, model.download(), self.cfg.surfels.conf_threshold
            )
            paths.append(path)
        return paths
