"""Sparse keypoint pipeline tests: detector, matcher, track table, kp init.

Mirrors what the reference only exercises implicitly through live runs
(SuperPoint + PointTracker + RigidRANSAC, SURVEY.md §2.4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimotionfusion_tpu.config import CameraModel, KeypointConfig, RansacConfig
from multimotionfusion_tpu.ops import ransac as ransac_ops
from multimotionfusion_tpu.tracking import superpoint as sp, tracker
from tests import synthetic

CAM = CameraModel(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)
KCFG = KeypointConfig(max_keypoints=256, max_tracks=1024, track_history=8,
                      detector="patch", match_dist_gate=1.0)


def _frame(T_wc):
    depth, rgb = synthetic.render(T_wc, CAM)
    from multimotionfusion_tpu.ops.image import rgb_to_intensity

    intensity = rgb_to_intensity(jnp.asarray(rgb))
    return jnp.asarray(depth), intensity


def test_patch_detect_finds_repeatable_corners():
    depth, intensity = _frame(np.eye(4, dtype=np.float32))
    kps = sp.patch_detect(intensity, 256)
    n = int(jnp.sum(kps.valid))
    assert n > 40
    # descriptors are unit-norm, zero-mean
    d = np.asarray(kps.desc[np.asarray(kps.valid)])
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    # detect twice: deterministic
    kps2 = sp.patch_detect(intensity, 256)
    np.testing.assert_array_equal(np.asarray(kps.xy), np.asarray(kps2.xy))


def test_superpoint_shapes_random_weights():
    params = sp.superpoint_init(jax.random.PRNGKey(0))
    depth, intensity = _frame(np.eye(4, dtype=np.float32))
    heat, desc = sp.superpoint_apply(params, intensity / 255.0)
    assert heat.shape == (CAM.height, CAM.width)
    assert desc.shape == (CAM.height // 8, CAM.width // 8, 256)
    kps = sp.superpoint_detect(params, intensity, 128, conf_thresh=0.0)
    assert kps.xy.shape == (128, 2)
    assert kps.desc.shape == (128, 256)


def test_mutual_match_cross_check():
    rng = np.random.default_rng(0)
    t_desc = rng.normal(size=(32, 16)).astype(np.float32)
    t_desc /= np.linalg.norm(t_desc, axis=1, keepdims=True)
    perm = rng.permutation(32)
    q_desc = t_desc[perm] + 0.01 * rng.normal(size=(32, 16)).astype(np.float32)
    match, matched_t = tracker.mutual_match(
        jnp.asarray(q_desc), jnp.asarray(t_desc),
        jnp.ones(32, bool), jnp.ones(32, bool), max_dist=0.5,
    )
    np.testing.assert_array_equal(np.asarray(match), perm)
    # gate: far descriptors don't match
    q_far = rng.normal(size=(32, 16)).astype(np.float32) * 10
    match2, _ = tracker.mutual_match(
        jnp.asarray(q_far), jnp.asarray(t_desc),
        jnp.ones(32, bool), jnp.ones(32, bool), max_dist=0.5,
    )
    assert int((np.asarray(match2) >= 0).sum()) == 0


def test_track_table_extend_and_prune():
    table = tracker.empty(KCFG.max_tracks, KCFG.track_history, KCFG.desc_dim)
    T1 = np.eye(4, dtype=np.float32)
    T2 = synthetic.pose((0, 0, 0), (0.02, 0, 0))
    d1, i1 = _frame(T1)
    d2, i2 = _frame(T2)
    k1 = sp.patch_detect(i1, KCFG.max_keypoints)
    k2 = sp.patch_detect(i2, KCFG.max_keypoints)
    table = tracker.add_keypoints(table, k1, d1, 1, CAM, KCFG)
    n_active_1 = int(jnp.sum(table.active))
    assert n_active_1 == int(jnp.sum(k1.valid))
    table = tracker.add_keypoints(table, k2, d2, 2, CAM, KCFG)
    p0, p1, valid = tracker.last_pair(table, 2)
    n_pairs = int(jnp.sum(valid))
    # a solid share of keypoints tracked across the small motion
    assert n_pairs > 25
    # tracked pairs should be displaced by ~the camera motion (scene static,
    # camera moved +x => points move -x in camera frame)
    dx = np.asarray(p1[np.asarray(valid), 0] - p0[np.asarray(valid), 0])
    assert np.median(dx) < -0.01

    # prune: with min_kps=30 every 1-2 length track is stale after enough time
    pruned = tracker.prune(table, 2 + 40, KCFG)
    assert int(jnp.sum(pruned.active)) == 0


def test_kp_ransac_recovers_motion():
    table = tracker.empty(KCFG.max_tracks, KCFG.track_history, KCFG.desc_dim)
    T1 = np.eye(4, dtype=np.float32)
    T2 = synthetic.pose((0.0, 0.008, 0.0), (0.02, 0.0, 0.005))
    d1, i1 = _frame(T1)
    d2, i2 = _frame(T2)
    table = tracker.add_keypoints(table, sp.patch_detect(i1, 256), d1, 1, CAM, KCFG)
    table = tracker.add_keypoints(table, sp.patch_detect(i2, 256), d2, 2, CAM, KCFG)
    p0, p1, valid = tracker.last_pair(table, 2)
    res = ransac_ops.ransac_fit(
        jax.random.PRNGKey(0), p0, p1, valid, RansacConfig(inlier_threshold=0.02)
    )
    # pose composition: Tnew = T1 @ T_rel should recover T2 up to the pixel
    # quantisation of the detector (1 px of parallax ~ z/f ~ 12-19 mm here;
    # kp init only SEEDS the dense solver, which then refines sub-mm)
    assert bool(res.ok)
    Tnew = np.eye(4) @ np.asarray(res.transform)
    delta = np.linalg.inv(np.asarray(T2)) @ Tnew
    assert np.linalg.norm(delta[:3, 3]) < 0.015
    rot_err = np.arccos(np.clip((np.trace(delta[:3, :3]) - 1) / 2, -1, 1))
    assert rot_err < 0.015


def test_engine_kp_init_end_to_end():
    from multimotionfusion_tpu.config import EngineConfig, SurfelConfig
    from multimotionfusion_tpu.engine import MultiMotionFusionTPU
    from multimotionfusion_tpu.io.readers import SyntheticLogReader

    cfg = EngineConfig(
        camera=CAM,
        odom_init="kp",
        enable_multi_model=False,
        keypoints=KCFG,
        surfels=SurfelConfig(max_surfels=65536, depth_cutoff=5.0),
    )
    reader = SyntheticLogReader(
        CAM, num_frames=8, cam_step=(0.004, 0, 0), cam_rot_step=(0, 0.002, 0)
    )
    engine = MultiMotionFusionTPU(cfg)
    for frame in reader:
        engine.process_frame(frame)
    engine.finish()
    est = np.stack([np.asarray(p) for _, p in engine._pose_dev])
    gt = np.stack(reader.gt_poses)
    ate = np.sqrt(np.mean(np.sum((est[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=-1)))
    assert ate < 0.01, ate


def test_refine_track_subset_backdates_motion():
    """A constantly moving point set tracked for several frames: the per-step
    rigid fits must recover the inter-frame motion for every step."""
    import jax

    from multimotionfusion_tpu.config import RansacConfig

    table = tracker.empty(KCFG.max_tracks, KCFG.track_history, KCFG.desc_dim)
    step = np.array([0.02, 0.0, -0.01], np.float32)
    for t in range(1, 5):
        T_wc = synthetic.pose((0, 0, 0), tuple(step * t))
        d, i = _frame(T_wc)
        kps = sp.patch_detect(i, KCFG.max_keypoints)
        table = tracker.add_keypoints(table, kps, d, t, CAM, KCFG)

    sel = table.active  # single-model: all tracks
    rel, _ = tracker.refine_track_subset(
        table, sel, 4, 3, jax.random.PRNGKey(0),
        RansacConfig(inlier_threshold=0.02),
    )
    rel = np.asarray(rel)
    # camera moved +step each tick => points moved -step in camera frame
    # => p(t-1) = p(t) + step => T_k translation ~ +step
    for k in range(3):
        assert np.linalg.norm(rel[k][:3, 3] - step) < 0.02, (k, rel[k][:3, 3])  # ~1px parallax
