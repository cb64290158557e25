"""Assembly of per-level odometry inputs from frame + prediction images.

Mirrors the init sequence of reference Model::initICP (Core/Model/Model.cpp:391-408)
-> RGBDOdometry::initICPModel/initRGBModel/initICP/initRGB (RGBDOdometry.cpp:110-215):

- prediction side ("last"): predicted vertex/normal maps are given in the
  prediction's CAMERA frame at level 0, resized down per level, transformed to
  the GLOBAL frame with the model pose; prediction depth/intensity pyramids come
  from the camera-frame prediction;
- frame side ("next"/"curr"): vertex maps are rebuilt per level from the
  (masked) depth pyramid; intensity from RGB, Sobel gradients per level.

Deviation from the reference (documented): the reference's pyramid-variant
initICP leaves `vmaps_tmp` stale, so its `nextDepth` photometric pyramids hold
the PREDICTION's depth instead of the frame's (RGBDOdometry.cpp:179,201-204).
We use the frame's depth (upstream-ElasticFusion behaviour, strictly better).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp

from multimotionfusion_tpu.config import CameraModel, OdometryConfig
from multimotionfusion_tpu.odometry.rgbd import LevelData
from multimotionfusion_tpu.ops import image as imops
from multimotionfusion_tpu.ops import maps as mapops


class FramePyramids(NamedTuple):
    """Per-frame pyramids shared by all models (built once per frame)."""

    depth: List[jnp.ndarray]  # filtered metric depth
    intensity: List[jnp.ndarray]
    mask: List[jnp.ndarray]  # int32 model ids
    didx: List[jnp.ndarray]
    didy: List[jnp.ndarray]


def build_frame_pyramids(
    depth: jnp.ndarray,
    rgb: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: OdometryConfig,
) -> FramePyramids:
    depth_pyr = imops.build_pyramid(depth, cfg.num_pyr)
    intensity = imops.rgb_to_intensity(rgb)
    int_pyr = imops.build_pyramid(intensity, cfg.num_pyr)
    mask_pyr = imops.build_pyramid_nearest(mask.astype(jnp.int32), cfg.num_pyr)
    didx, didy = [], []
    for lvl in range(cfg.num_pyr):
        gx, gy = imops.sobel_gradients(int_pyr[lvl])
        didx.append(gx)
        didy.append(gy)
    return FramePyramids(depth_pyr, int_pyr, mask_pyr, didx, didy)


def build_level_data(
    frame: FramePyramids,
    pred_vmap_cam: jnp.ndarray,  # [H,W,3] prediction vertices, prediction camera frame
    pred_nmap_cam: jnp.ndarray,
    pred_intensity: jnp.ndarray,  # [H,W] prediction intensity
    cam: CameraModel,
    cfg: OdometryConfig,
    mask_id: int | jnp.ndarray = 0,
) -> List[LevelData]:
    """Build per-level LevelData for one model's tracking step.

    Prediction maps stay in the PREDICTION CAMERA frame throughout: the GN
    solver associates/warps in that frame (rigid-invariant gates), so the
    reference's camera->global->camera round trip (initICPModel's tranformMaps,
    RGBDOdometry.cpp:120-140) is dropped — it only adds f32 cancellation error
    far from the world origin.
    """
    # Coarse prediction maps are REBUILT from a depth pyramid instead of
    # resizing the vertex/normal maps (the reference's resizeVMap averages
    # vertices off the coarse pixel rays): ray-aligned vertices at every
    # level let the solver's sampling bank store depth only and reconstruct
    # positions per tap (rgbd.build_compact_bank), like the frame side.
    pdepth_pyr = imops.build_pyramid(pred_vmap_cam[..., 2], cfg.num_pyr)
    vpyr_cam = [pred_vmap_cam]
    npyr_cam = [pred_nmap_cam]
    for lvl in range(1, cfg.num_pyr):
        v = mapops.create_vmap(pdepth_pyr[lvl], cam.level(lvl), 1e9)
        vpyr_cam.append(v)
        npyr_cam.append(mapops.create_nmap(v))

    depth_last0 = mapops.vertices_to_depth(pred_vmap_cam, cfg.max_depth_rgb)
    depth_last = imops.build_pyramid(depth_last0, cfg.num_pyr)
    img_last = imops.build_pyramid(pred_intensity, cfg.num_pyr)

    levels = []
    for lvl in range(cfg.num_pyr):
        v_g, n_g = vpyr_cam[lvl], npyr_cam[lvl]
        mask_lvl = frame.mask[lvl]
        if cfg.mask_icp:
            vmap_curr = mapops.create_vmap(
                frame.depth[lvl], cam.level(lvl), cfg.max_depth_rgb,
                mask=mask_lvl, mask_id=mask_id,
            )
        else:
            vmap_curr = mapops.create_vmap(
                frame.depth[lvl], cam.level(lvl), cfg.max_depth_rgb
            )
        nmap_curr = mapops.create_nmap(vmap_curr)
        levels.append(
            LevelData(
                vmap_curr=vmap_curr,
                nmap_curr=nmap_curr,
                vmap_prev=v_g,
                nmap_prev=n_g,
                depth_last=depth_last[lvl],
                depth_next=frame.depth[lvl],
                img_last=img_last[lvl],
                img_next=frame.intensity[lvl],
                mask_next=mask_lvl,
                didx=frame.didx[lvl],
                didy=frame.didy[lvl],
            )
        )
    return levels
