"""Build a small but fully-populated multi-model engine state for sharded
execution checks.

Used by __graft_entry__.dryrun_multichip (driver deliverable) and
tests/test_parallel.py: constructs a MultiState with EVERY object slot active
and holding real surfel data (one vertical strip of a synthetic scene per
slot, mirroring the spawn path engine_multi.py spawn section), so one
`multi_frame_step` exercises per-slot masked odometry, segmentation,
lifecycle, fusion and prediction — the complete production program the
reference runs as a sequential per-model loop
(Core/MultiMotionFusion.cpp:312-387).
"""

from __future__ import annotations

import numpy as np

from multimotionfusion_tpu.config import (
    CameraModel,
    EngineConfig,
    KeypointConfig,
    RansacConfig,
    SurfelConfig,
)


def tiny_config(n_slots: int) -> EngineConfig:
    """Production pipeline shape (all stages on) at miniature array sizes."""
    cam = CameraModel(width=64, height=48, fx=52.8, fy=52.8, cx=32.0, cy=24.0)
    return EngineConfig(
        camera=cam,
        surfels=SurfelConfig(max_surfels=4096, depth_cutoff=5.0),
        keypoints=KeypointConfig(max_keypoints=64, max_tracks=256, track_history=8),
        ransac=RansacConfig(iterations=32),
        object_slots=n_slots,
        object_capacity=512,
        enable_multi_model=True,
        enable_redetection=True,
        upload_depth_mm=False,
        upload_yuv420=False,
    )


def build_state(cfg: EngineConfig):
    """Return (state, frame2_rgb, frame2_depth): a MultiState after one init
    frame, with all object slots force-activated from per-slot image strips,
    plus the next frame's arrays (small camera motion)."""
    import jax.numpy as jnp

    from multimotionfusion_tpu.engine import MultiMotionFusionTPU
    from multimotionfusion_tpu.io import synthetic
    from multimotionfusion_tpu.io.frame import FrameData
    from multimotionfusion_tpu.model import surfel_map as sm
    from multimotionfusion_tpu.ops import image as imops, maps as mapops

    cam = cfg.camera
    h, w = cam.height, cam.width
    n_slots = cfg.object_slots

    depth0, rgb0 = synthetic.render(np.eye(4, dtype=np.float32), cam)
    eng = MultiMotionFusionTPU(cfg)
    eng.process_frame(FrameData(rgb=rgb0.astype(np.uint8), depth=depth0, timestamp=0))
    state = eng.mstate

    # per-slot strip mask: slot k owns mask id k+1 on its vertical strip
    cols = np.arange(w)
    strip = (cols * n_slots) // w  # [w] in 0..n_slots-1
    mask_np = np.broadcast_to(strip[None, :] + 1, (h, w)).astype(np.int32)

    rgb = jnp.asarray(rgb0)
    depth = jnp.asarray(depth0)
    cut = cfg.surfels.depth_cutoff
    depth_filt = imops.bilateral_depth_filter(depth)
    vmap_raw = mapops.create_vmap(depth, cam, cut)
    vmap_f = mapops.create_vmap(depth_filt, cam, cut)
    nmap_f = mapops.create_nmap(vmap_f)
    fs = sm.compute_frame_surfels(rgb, vmap_raw, vmap_f, nmap_f, cam, 1, cut, 100.0)

    mask_flat = jnp.asarray(mask_np).reshape(-1)
    datas, counts = [], []
    for k in range(n_slots):
        valid = fs.valid & (mask_flat == k + 1)
        sub = sm.FrameSurfels(
            data=jnp.where(valid[None], fs.data, 0.0), valid=valid
        )
        omap = sm.init_from_frame(sub, cfg.object_capacity)
        datas.append(omap.data)
        counts.append(omap.count)

    obj = state.objects
    obj = obj._replace(
        data=jnp.stack(datas),
        count=jnp.stack(counts),
        active=jnp.ones((n_slots,), bool),
        spawn_tick=jnp.ones((n_slots,), jnp.int32),
    )
    state = state._replace(objects=obj, prev_mask=jnp.asarray(mask_np))

    T2 = synthetic.pose((0.0, 0.002, 0.0), (0.003, 0.0, 0.001))
    depth2, rgb2 = synthetic.render(T2, cam)
    return eng, state, rgb2, depth2


def run_step(eng, state, rgb2, depth2):
    """One full multi_frame_step on `state` (sharded or not)."""
    import jax.numpy as jnp

    from multimotionfusion_tpu import engine_multi as em

    cfg = eng.cfg
    return em.multi_frame_step(
        state,
        jnp.asarray(rgb2),
        jnp.asarray(depth2),
        None,
        2,
        1.0,
        eng.sp_params,
        cfg.camera,
        cfg,
        cfg.surfels.max_surfels,
    )
