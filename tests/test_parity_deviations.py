"""Empirical pins for documented deviations from the reference.

Each deviation from reference semantics is argued in code comments; these
tests pin the *behaviour* so the argument is backed by evidence:

1. LK dense flow substitutes Farneback (segmentation/flow.py:1-9): on a
   known rigid camera motion the recovered flow must match the analytic
   flow field of the rendered scene.
2. Un-normalised reprojection probability (flow_crf.py:52-62): with a SINGLE
   active model the reference's row-normalisation is identically 1 and its
   outlier row reads uninitialised memory, so the first object could never
   spawn through this term; the raw-fit-quality form must (a) let the
   outlier class win exactly where the model misfits and (b) keep the model
   winning where it fits.
3. Unseen-patience (config.py model_unseen_patience=3 vs reference 1) is
   pinned in tests/test_accuracy.py::test_unseen_patience_deactivates_on_schedule.
4. Object-pose composition (engine_multi.py:19-21) is pinned in
   tests/test_accuracy.py::test_object_trajectory_tracks_motion.
"""

import numpy as np
import jax.numpy as jnp

from multimotionfusion_tpu.config import CameraModel
from multimotionfusion_tpu.io import synthetic
from multimotionfusion_tpu.ops import image as imops
from multimotionfusion_tpu.segmentation import flow_crf
from multimotionfusion_tpu.segmentation.flow import dense_flow

CAM = CameraModel(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)


def _analytic_flow(T0, T1, depth0, cam):
    """GT pixel displacement field frame0 -> frame1 from depth + poses."""
    h, w = depth0.shape
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    z = depth0.astype(np.float64)
    pc0 = np.stack([(xs - cam.cx) / cam.fx * z, (ys - cam.cy) / cam.fy * z, z],
                   axis=-1)
    rel = np.linalg.inv(T1) @ T0  # cam0 -> cam1
    pc1 = pc0 @ rel[:3, :3].T + rel[:3, 3]
    z1 = np.maximum(pc1[..., 2], 1e-9)
    u1 = pc1[..., 0] * cam.fx / z1 + cam.cx
    v1 = pc1[..., 1] * cam.fy / z1 + cam.cy
    return np.stack([u1 - xs, v1 - ys], axis=-1), z > 0


def test_lk_flow_matches_analytic_rigid_flow():
    """Deviation 1: the LK substitute must recover the true flow of a rigid
    camera motion (translation + a touch of yaw) to sub-pixel median error at
    the CRF working scale of the PRODUCTION shape (640x480 -> 120x160) — the
    property the Farneback stage provides the reference. Measured after the
    gradient-scale fix: median EPE ~0.18 px, mean ~0.31 px."""
    cam = CameraModel()  # 640x480 production shape
    T0 = np.eye(4, dtype=np.float32)
    T1 = synthetic.pose((0.0, 0.004, 0.0), (0.008, 0.0, 0.0))
    d0, rgb0 = synthetic.render(T0, cam)
    d1, rgb1 = synthetic.render(T1, cam)

    scale = 0.25
    hc, wc = int(cam.height * scale), int(cam.width * scale)
    i0 = imops.resize_bilinear(
        imops.rgb_to_intensity(jnp.asarray(rgb0)), (hc, wc))
    i1 = imops.resize_bilinear(
        imops.rgb_to_intensity(jnp.asarray(rgb1)), (hc, wc))
    est = np.asarray(dense_flow(i0, i1))  # [hc, wc, 2] px at coarse scale

    gt_full, valid = _analytic_flow(T0, T1, d0, cam)
    gt = np.asarray(imops.resize_bilinear(
        jnp.asarray(gt_full.astype(np.float32)), (hc, wc))) * scale

    # interior crop (LK borders are unreliable, as are Farneback's)
    c = 8
    epe = np.linalg.norm(est - gt, axis=-1)[c:-c, c:-c]
    gt_mag = np.linalg.norm(gt, axis=-1)[c:-c, c:-c]
    assert gt_mag.mean() > 0.5  # the motion is actually visible at this scale
    assert np.median(epe) < 0.5, np.median(epe)
    assert np.mean(epe) < 1.0, np.mean(epe)


def test_reprojection_probability_single_model_spawns_outlier():
    """Deviation 2: one active model; its prediction explains the background
    but misfits a mover region by 0.2 m. The outlier row must dominate on the
    mover (so a first object CAN spawn) and lose on the background."""
    h, w = 30, 40
    frame = np.full((h, w), 2.0, np.float32)
    frame[10:20, 10:20] = 1.2  # mover sits 0.8 m in front of the wall
    pred = np.full((1, h, w), 2.0, np.float32)  # model 0 predicts wall only
    active = jnp.asarray([True])

    prob, outlier, _ = flow_crf.reprojection_probability(
        jnp.asarray(frame), jnp.asarray(pred), active, max_err=0.03
    )
    prob, outlier = np.asarray(prob), np.asarray(outlier)
    mover = np.zeros((h, w), bool)
    mover[10:20, 10:20] = True

    assert (outlier[mover] > 0.99).all()  # metre-scale misfit -> pure outlier
    assert (prob[0][mover] < 0.01).all()
    assert (prob[0][~mover] > 0.9).all()  # model keeps the background
    assert (outlier[~mover] < 0.1).all()

    # coverage rule: where NO model has a prediction the pixel is NEUTRAL
    # (never-observed space is new GLOBAL geometry, not a new object; the
    # reference's expsum==0 branch reaches the same outcome)
    pred2 = pred.copy()
    pred2[0, :5, :] = 0.0
    prob2, outlier2, _ = flow_crf.reprojection_probability(
        jnp.asarray(frame), jnp.asarray(pred2), active, max_err=0.03
    )
    assert (np.asarray(prob2)[0, :5, :] == 0).all()
    assert (np.asarray(outlier2)[:5, :] == 0).all()

    # in-front rule: an observation BEHIND the model's surface is an
    # occlusion reveal (stale map), owned by fusion's see-through cull —
    # it must not vote for a new object
    frame3 = frame.copy()
    frame3[10:20, 10:20] = 3.0  # farther than the predicted wall at 2 m
    _, outlier3, _ = flow_crf.reprojection_probability(
        jnp.asarray(frame3), jnp.asarray(pred), active, max_err=0.03
    )
    assert (np.asarray(outlier3)[mover] == 0).all()


def test_reprojection_probability_two_models_share_scene():
    """With two active models the raw rows stay comparable: each model wins
    exactly the region whose depth it predicts, and the outlier row wins the
    region neither explains."""
    h, w = 30, 40
    frame = np.full((h, w), 2.0, np.float32)
    frame[:, 20:] = 1.0  # right half: object at 1 m
    frame[25:, :10] = 1.5  # bottom-left corner: in front of the wall,
    # explained by neither model -> outlier territory
    pred = np.zeros((2, h, w), np.float32)
    pred[0] = 2.0  # model 0: wall everywhere
    pred[1, :, 20:] = 1.0  # model 1: the object half
    active = jnp.asarray([True, True])

    prob, outlier, _ = flow_crf.reprojection_probability(
        jnp.asarray(frame), jnp.asarray(pred), active, max_err=0.03
    )
    prob, outlier = np.asarray(prob), np.asarray(outlier)
    left = np.zeros((h, w), bool); left[:25, :20] = True
    right = np.zeros((h, w), bool); right[:, 20:] = True
    corner = np.zeros((h, w), bool); corner[25:, :10] = True

    assert (prob[0][left] > 0.9).all()
    assert (prob[1][right] > 0.9).all()
    assert (prob[0][right] < 0.01).all()
    assert (outlier[corner] > 0.99).all()
    assert (outlier[right] < 0.1).all()
