"""Per-pyramid-level keypoint trackers (reference MultiMotionFusion.cpp:83-87).

The reference keeps a SEPARATE PointTracker per used pyramid level: keypoint
pose initialisation consumes tracker[odom_cfg.init_lvl] (:287) and
segmentation velocities consume tracker[odom_cfg.segm_lvl] (:148). The level
split exists because segmentation wants coarser, longer-lived tracks: fine
image detail decorrelates full-resolution descriptors under motion/noise
while the downsampled level keeps matching.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from multimotionfusion_tpu.io import synthetic
from multimotionfusion_tpu.io.frame import FrameData
from multimotionfusion_tpu.ops.image import build_pyramid
from multimotionfusion_tpu.parallel import dryrun
from multimotionfusion_tpu.tracking import tracker
from multimotionfusion_tpu.tracking.superpoint import patch_detect


def _textured(shift: float, rng: np.random.Generator, h=96, w=128):
    """Large-scale blobs (track-worthy structure) + per-frame speckle that
    decorrelates FULL-Res descriptors but averages out one level down."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (
        80.0
        + 60.0 * np.sin((xs - shift) * 0.10) * np.sin(ys * 0.11)
        + 40.0 * np.cos((xs - shift) * 0.23 + ys * 0.17)
    )
    noise = rng.normal(0.0, 28.0, (h, w)).astype(np.float32)
    return np.clip(base + noise, 0.0, 255.0)


def _match_rate(lvl: int) -> float:
    rng = np.random.default_rng(7)
    img0 = _textured(0.0, rng)
    img1 = _textured(3.0, rng)  # fresh speckle + 3 px shift
    p0 = build_pyramid(jnp.asarray(img0), lvl + 1)[lvl]
    p1 = build_pyramid(jnp.asarray(img1), lvl + 1)[lvl]
    k0 = patch_detect(p0, 96)
    k1 = patch_detect(p1, 96)
    idx, _ = tracker.mutual_match(k1.desc, k0.desc, k1.valid, k0.valid, 1.0)
    n_valid = int(jnp.sum(k1.valid))
    if n_valid == 0:
        return 0.0
    return float(jnp.sum(idx >= 0)) / n_valid


def test_coarse_level_tracks_survive_fine_level_noise():
    """Level-1 detection keeps matching through speckle that kills level-0
    matches — the reason the reference separates init_lvl and segm_lvl."""
    r0 = _match_rate(0)
    r1 = _match_rate(1)
    assert r1 > r0 + 0.15, (r0, r1)
    assert r1 > 0.3, r1


def _run_frames(cfg, n=4):
    from multimotionfusion_tpu.engine import MultiMotionFusionTPU

    eng = MultiMotionFusionTPU(cfg)
    cam = cfg.camera
    for i in range(n):
        T = synthetic.pose((0.001 * i, 0.0, 0.0), (0.0, 0.0, 0.0))
        depth, rgb = synthetic.render(T, cam)
        eng.process_frame(
            FrameData(rgb=rgb.astype(np.uint8), depth=depth,
                      timestamp=int(i / 30 * 1e9))
        )
    eng.finish()
    return eng


def test_segm_tracker_populates_and_segmentation_runs():
    cfg = dryrun.tiny_config(2)
    cfg = dataclasses.replace(
        cfg, odometry=dataclasses.replace(cfg.odometry, segm_lvl=1)
    )
    eng = _run_frames(cfg)
    ts = eng.mstate.tracks_segm
    assert ts.capacity == cfg.keypoints.max_tracks  # real table, not the stub
    assert int(jnp.sum(ts.active)) > 0  # coarse detections opened tracks
    # the init-level table keeps its own population
    assert int(jnp.sum(eng.mstate.tracks.active)) > 0


def test_default_levels_share_one_table():
    cfg = dryrun.tiny_config(2)  # init_lvl == segm_lvl == 0
    eng = _run_frames(cfg, n=3)
    assert eng.mstate.tracks_segm.capacity == 1  # stub: no duplicate work


def test_cli_level_flags():
    from multimotionfusion_tpu.app.main import build_parser, make_config

    args = build_parser().parse_args(
        ["-l", "synthetic", "-lvl_init", "0", "-lvl_segm", "1"]
    )
    cfg = make_config(args)
    assert cfg.odometry.init_lvl == 0
    assert cfg.odometry.segm_lvl == 1
