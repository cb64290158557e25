"""Fern keyframe database: encoding, gated insertion, retrieval, relocalisation."""

import jax.numpy as jnp
import numpy as np

from multimotionfusion_tpu.config import CameraModel, FernConfig, OdometryConfig
from multimotionfusion_tpu.model import ferns
from multimotionfusion_tpu.ops import maps as mapops
from tests import synthetic

CAM = CameraModel(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)
FCFG = FernConfig(num_ferns=300, factor=4, max_depth=5.0)
CAM_S = CameraModel(
    width=CAM.width // 4, height=CAM.height // 4,
    fx=CAM.fx / 4, fy=CAM.fy / 4, cx=CAM.cx / 4, cy=CAM.cy / 4,
)
OCFG = OdometryConfig(
    num_pyr=2, iterations=(10, 5), so3_prealign=False,
    mask_icp=False, mask_rgb=False, min_grad_magnitudes=(5.0, 3.0),
)


def _frame_small(T_wc):
    depth, rgb = synthetic.render(T_wc, CAM)
    depth = jnp.asarray(depth)
    rgb = jnp.asarray(rgb)
    vmap = mapops.create_vmap(depth, CAM, 5.0)
    nmap = mapops.create_nmap(vmap)
    rgb_s, vmap_s, nmap_s = ferns.downsample_frame(rgb, vmap, nmap, 4)
    depth_s = vmap_s[..., 2]
    return rgb_s, vmap_s, nmap_s, depth_s


def _poses(n):
    out = []
    for i in range(n):
        out.append(synthetic.pose((0, 0.08 * i, 0), (0.15 * i, 0, 0)))
    return out


def test_insertion_gating_and_retrieval():
    db = ferns.create(FCFG, CAM, capacity=16, seed=0)
    poses = _poses(4)
    for i, T in enumerate(poses):
        rgb_s, vmap_s, nmap_s, _ = _frame_small(T)
        db, inserted = ferns.add_frame(db, rgb_s, vmap_s, nmap_s, jnp.asarray(T), i, 0.2)
        assert bool(inserted), f"distinct view {i} must insert"
    assert int(db.count) == 4

    # re-adding an existing view must be rejected by the dissimilarity gate
    rgb_s, vmap_s, nmap_s, _ = _frame_small(poses[1])
    db2, inserted = ferns.add_frame(db, rgb_s, vmap_s, nmap_s, jnp.asarray(poses[1]), 9, 0.2)
    assert not bool(inserted)
    assert int(db2.count) == 4

    # retrieval: a slightly perturbed view of pose 2 matches keyframe 2
    T_q = synthetic.pose((0, 0.08 * 2 + 0.01, 0), (0.15 * 2 + 0.01, 0, 0))
    rgb_q, vmap_q, nmap_q, _ = _frame_small(T_q)
    codes = ferns.encode(db, rgb_q, vmap_q)
    sim = np.asarray(ferns.block_hd(db, codes))
    assert int(np.argmax(sim)) == 2
    assert sim[2] > 0.6


def test_relocalisation():
    db = ferns.create(FCFG, CAM, capacity=16, seed=0)
    poses = _poses(4)
    for i, T in enumerate(poses):
        rgb_s, vmap_s, nmap_s, _ = _frame_small(T)
        db, _ = ferns.add_frame(db, rgb_s, vmap_s, nmap_s, jnp.asarray(T), i, 0.2)

    # "lost" at a pose near keyframe 1: relocalise from scratch
    T_true = synthetic.pose((0, 0.08 + 0.015, 0), (0.15 + 0.02, 0, 0.01))
    rgb_q, vmap_q, nmap_q, depth_q = _frame_small(T_true)
    res = ferns.find_frame(
        db, rgb_q, vmap_q, nmap_q, depth_q, CAM_S, OCFG,
        max_icp_error=5e-4, min_icp_count_frac=0.05,
    )
    assert int(res.best) == 1
    assert bool(res.ok), (float(res.similarity), float(res.icp_error),
                          float(res.photo_error))
    # the reloc pose is computed at the heavily downsampled fern resolution
    # (1 px ~ 4.5 cm of parallax here) — it only needs to land inside the
    # full-resolution solver's convergence basin, exactly like the reference's
    # ÷8 relocalisation (Ferns.cpp:145-263)
    T_est = np.asarray(res.pose)
    delta = np.linalg.inv(np.asarray(T_true)) @ T_est
    assert np.linalg.norm(delta[:3, 3]) < 0.05
    rot_err = np.arccos(np.clip((np.trace(delta[:3, :3]) - 1) / 2, -1, 1))
    assert rot_err < 0.05
