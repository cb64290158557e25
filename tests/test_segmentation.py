"""Segmentation tests: optical flow, CRF mean-field, components, flow-CRF.

The reference never tests segmentation automatically (SURVEY.md §4); here a
synthetic moving object with known ground truth drives assertions on the
outlier detection that triggers model spawning.
"""

import jax.numpy as jnp
import numpy as np

from multimotionfusion_tpu.config import CameraModel, SegmentationConfig
from multimotionfusion_tpu.ops.image import rgb_to_intensity
from multimotionfusion_tpu.segmentation import components, crf
from multimotionfusion_tpu.segmentation.flow import dense_flow
from multimotionfusion_tpu.segmentation.flow_crf import flow_crf_segmentation
from tests import synthetic

CAM = CameraModel(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)


def test_dense_flow_recovers_shift():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    from multimotionfusion_tpu.ops.image import gaussian_blur

    img = np.asarray(gaussian_blur(jnp.asarray(base), 1.5, 3))
    shift = 3
    nxt = np.roll(img, -shift, axis=1)  # nxt(x) = img(x + shift)
    flow = np.asarray(dense_flow(jnp.asarray(img), jnp.asarray(nxt)))
    inner = flow[16:-16, 24:-24]
    # nxt(x + flow) ~ prev(x) => flow_x ~ -shift
    assert abs(np.median(inner[..., 0]) + shift) < 0.75
    assert abs(np.median(inner[..., 1])) < 0.5


def test_connected_components_and_largest():
    mask = np.zeros((32, 32), bool)
    mask[2:6, 2:6] = True  # 16 px
    mask[10:20, 10:26] = True  # 160 px
    mask[28:30, 1:3] = True  # 4 px
    lab = np.asarray(components.connected_components(jnp.asarray(mask)))
    assert lab[3, 3] == lab[4, 4] != lab[12, 12]
    assert lab[29, 1] >= 0 and lab[0, 0] == -1
    largest = np.asarray(components.keep_largest_component(jnp.asarray(mask)))
    assert largest[12, 12] and not largest[3, 3] and not largest[29, 1]
    assert largest.sum() == 160


def test_mean_field_denoises():
    rng = np.random.default_rng(0)
    h, w = 48, 64
    gt = np.zeros((h, w), np.int32)
    gt[:, 32:] = 1
    noisy = gt.copy().reshape(-1)
    flip = rng.choice(h * w, size=h * w // 10, replace=False)
    noisy[flip] = 1 - noisy[flip]
    noisy = noisy.reshape(h, w)
    unary = np.stack([noisy == 0, noisy == 1], axis=0).astype(np.float32)
    unary = -np.log(np.clip(unary * 0.8 + 0.1, 1e-6, 1.0))
    q = crf.mean_field(
        jnp.asarray(unary), [("gaussian", dict(sigma=2.0), 3.0)], iterations=5
    )
    out = np.asarray(jnp.argmax(q, 0))
    err_before = (noisy != gt).mean()
    err_after = (out != gt).mean()
    assert err_after < 0.3 * err_before


def test_flow_crf_detects_moving_object():
    # the test camera's CRF grid is 40x30 (vs 160x120 at production scale);
    # CRF support regions shrink accordingly, so the new-label area gate is
    # scaled down — the mechanism under test is outlier detection + locality
    cfg = SegmentationConfig(new_label_min_frac=0.02)
    T_id = np.eye(4, dtype=np.float32)
    # sphere moves 6 cm between frames; camera static; the "model prediction"
    # is the PREVIOUS frame's geometry (what the static model would predict)
    d_prev, rgb_prev = synthetic.render_moving_sphere(T_id, CAM, (0.0, 0.0, 0.0))
    d_next, rgb_next = synthetic.render_moving_sphere(T_id, CAM, (0.06, 0.0, -0.04))

    prev_i = rgb_to_intensity(jnp.asarray(rgb_prev))
    next_i = rgb_to_intensity(jnp.asarray(rgb_next))
    pred_depth = jnp.asarray(d_prev)[None]  # model 0 prediction
    active = jnp.array([True])
    # sparse track unaries drive outlier detection (with a single model the
    # normalised reprojection probability is 1 everywhere — same as the
    # reference): tracks on the mover violate model 0's motion (high px/s),
    # background tracks fit it
    moved_px = np.abs(d_next - d_prev) > 0.02
    rng = np.random.default_rng(0)
    ys, xs = np.where(moved_px)
    sel = rng.choice(len(ys), size=24, replace=False)
    sphere_xy = np.stack([xs[sel], ys[sel]], axis=-1).astype(np.float32)
    ys2, xs2 = np.where(~moved_px & (d_next > 0))
    sel2 = rng.choice(len(ys2), size=48, replace=False)
    bg_xy = np.stack([xs2[sel2], ys2[sel2]], axis=-1).astype(np.float32)
    t_xy = jnp.asarray(np.concatenate([sphere_xy, bg_xy]))
    t_vel = jnp.asarray(
        np.concatenate([np.full(24, 80.0), np.full(48, 2.0)])
    )[None]  # [1, T] velocity error vs model 0 (px/s)
    t_valid = jnp.ones((72,), bool)

    res = flow_crf_segmentation(
        prev_i, next_i, jnp.asarray(d_next), pred_depth, active,
        t_xy, t_vel, t_valid, CAM, cfg,
    )
    assert bool(res.has_new_label)
    new = np.asarray(res.new_label_mask)
    # ground truth: pixels whose depth changed materially belong to the mover
    moved = np.abs(d_next - d_prev) > 0.02
    overlap = (new & moved).sum() / max(new.sum(), 1)
    assert overlap > 0.5, overlap
    # the static background must stay model 0
    static_ok = (~moved) & (d_next > 0)
    assert (np.asarray(res.mask)[static_ok] == 0).mean() > 0.95


def test_flow_crf_static_scene_no_new_label():
    cfg = SegmentationConfig()
    T_id = np.eye(4, dtype=np.float32)
    d, rgb = synthetic.render(T_id, CAM)
    inten = rgb_to_intensity(jnp.asarray(rgb))
    res = flow_crf_segmentation(
        inten, inten, jnp.asarray(d), jnp.asarray(d)[None], jnp.array([True]),
        jnp.zeros((8, 2)), jnp.zeros((1, 8)), jnp.zeros((8,), bool), CAM, cfg,
    )
    assert not bool(res.has_new_label)
    assert (np.asarray(res.mask) == 0).all()
