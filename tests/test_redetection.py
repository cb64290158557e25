"""Redetection: re-attach a stored model to a new segment, and DB round-trip.

Function-level scenario (engine journey tests for redetection need long
sequences; the mechanism is pinned directly): a deactivated slot holds a
descriptor snapshot of the sphere; the sphere reappears displaced; the multi
frame step must REACTIVATE that slot (with the RANSAC pose) instead of
spawning a fresh model.
"""

import jax.numpy as jnp
import numpy as np

from multimotionfusion_tpu.config import (
    CameraModel,
    EngineConfig,
    KeypointConfig,
    SegmentationConfig,
    SurfelConfig,
)
from multimotionfusion_tpu.engine import MultiMotionFusionTPU
from multimotionfusion_tpu.io.frame import FrameData
from multimotionfusion_tpu.model import model_db
from multimotionfusion_tpu.tracking import superpoint as sp, tracker
from multimotionfusion_tpu.ops.image import rgb_to_intensity
from tests import synthetic

CAM = CameraModel(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)


def _cfg():
    return EngineConfig(
        camera=CAM,
        enable_multi_model=True,
        enable_redetection=True,
        odom_init="",
        object_slots=2,
        object_capacity=1 << 14,
        surfels=SurfelConfig(max_surfels=65536, depth_cutoff=5.0),
        keypoints=KeypointConfig(
            max_keypoints=256, max_tracks=1024, track_history=8,
            detector="patch", match_dist_gate=1.0,
        ),
        segmentation=SegmentationConfig(new_label_min_frac=0.02),
    )


def test_redetect_reactivates_stored_slot():
    import jax

    from multimotionfusion_tpu import engine_multi as em

    cfg = _cfg()
    centre0 = np.array([0.1, 0.0, 1.15])
    shift = np.array([0.1, 0.0, 0.0])

    # frame A: sphere at its original position -> snapshot source
    dA, rgbA = synthetic.render(
        np.eye(4, dtype=np.float32), CAM, sphere_center=tuple(centre0),
        sphere_radius=0.5,
    )
    d_bg, rgb_bg = synthetic.render(np.eye(4, dtype=np.float32), CAM, sphere_radius=1e-9)
    # frame B: background only (object gone); frame C: sphere reappears shifted
    dC, rgbC = synthetic.render(
        np.eye(4, dtype=np.float32), CAM, sphere_center=tuple(centre0 + shift),
        sphere_radius=0.5,
    )

    # engine warm-up on background so the global model doesn't contain the
    # sphere; then inject the stored snapshot built from frame A
    engine = MultiMotionFusionTPU(cfg)
    engine.process_frame(FrameData(rgb=rgb_bg.astype(np.uint8), depth=d_bg, timestamp=0))
    engine.process_frame(FrameData(rgb=rgb_bg.astype(np.uint8), depth=d_bg, timestamp=1))
    engine.finish()

    # snapshot: keypoints on the sphere of frame A, model-local = camera frame
    # at capture (slot pose = identity)
    kpsA = sp.patch_detect(rgb_to_intensity(jnp.asarray(rgbA)), 256)
    p3dA, hasdA = tracker.backproject_keypoints(kpsA, jnp.asarray(dA), CAM)
    on_sphere = (
        np.abs(
            dA[
                np.clip(np.rint(np.asarray(kpsA.xy)[:, 1]).astype(int), 0, CAM.height - 1),
                np.clip(np.rint(np.asarray(kpsA.xy)[:, 0]).astype(int), 0, CAM.width - 1),
            ]
            - d_bg[
                np.clip(np.rint(np.asarray(kpsA.xy)[:, 1]).astype(int), 0, CAM.height - 1),
                np.clip(np.rint(np.asarray(kpsA.xy)[:, 0]).astype(int), 0, CAM.width - 1),
            ]
        )
        > 0.01
    )
    valid = np.asarray(kpsA.valid & hasdA) & on_sphere
    assert valid.sum() > 20, valid.sum()

    obj = engine.mstate.objects
    ks = obj.stored_desc.shape[1]
    desc = np.zeros((ks, obj.stored_desc.shape[2]), np.float32)
    p3 = np.zeros((ks, 3), np.float32)
    v = np.zeros((ks,), bool)
    idx = np.where(valid)[0][:ks]
    desc[: len(idx)] = np.asarray(kpsA.desc)[idx]
    p3[: len(idx)] = np.asarray(p3dA)[idx]
    v[: len(idx)] = True
    obj = obj._replace(
        stored=obj.stored.at[0].set(True),
        stored_desc=obj.stored_desc.at[0].set(jnp.asarray(desc)),
        stored_p3d=obj.stored_p3d.at[0].set(jnp.asarray(p3)),
        stored_valid=obj.stored_valid.at[0].set(jnp.asarray(v)),
    )
    engine.mstate = engine.mstate._replace(objects=obj)

    # the sphere reappears shifted: the step must reactivate slot 0 with a
    # pose mapping camera points onto the stored (frame-A) model frame
    engine.process_frame(FrameData(rgb=rgbC.astype(np.uint8), depth=dC, timestamp=2))
    engine.finish()
    objs = engine.mstate.objects
    assert bool(objs.active[0]), "stored slot was not reactivated"
    assert not bool(objs.active[1]), "a fresh model was spawned instead"
    T = np.asarray(objs.pose[0])
    # expected: p_A = T p_C with p_C = p_A + shift => T translation ~ -shift.
    # The recovered pose is an INITIALISATION (activated models are refined
    # by dense tracking on the following frames); with millimetre-quantised
    # upload depth and patch descriptors at this miniature scale the sparse
    # fit lands within a few centimetres of truth.
    err = np.linalg.norm(T[:3, 3] + shift)
    assert err < 0.05, (T[:3, 3], err)
    # direction must be right even if the magnitude is coarse
    cos = -T[:3, 3] @ shift / (np.linalg.norm(T[:3, 3]) * np.linalg.norm(shift))
    assert cos > 0.9, (T[:3, 3], cos)


def test_model_db_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    surfels = {
        "position": rng.normal(size=(50, 3)).astype(np.float32),
        "confidence": rng.uniform(1, 20, 50).astype(np.float32),
        "color": rng.uniform(0, 255, (50, 3)).astype(np.float32),
        "normal": rng.normal(size=(50, 3)).astype(np.float32),
        "radius": rng.uniform(0.001, 0.01, 50).astype(np.float32),
    }
    desc = rng.normal(size=(64, 16)).astype(np.float32)
    p3d = rng.normal(size=(64, 3)).astype(np.float32)
    valid = np.zeros(64, bool)
    valid[:40] = True
    pose = np.eye(4)
    pose[:3, 3] = [1, 2, 3]
    path = model_db.save_model(str(tmp_path), 3, surfels, desc, p3d, valid, pose)
    assert model_db.list_models(str(tmp_path)) == [path]
    m = model_db.load_model(path)
    assert m["id"] == 3
    np.testing.assert_allclose(m["pose_world"], pose)
    assert m["descriptors"].shape == (40, 16)
    np.testing.assert_allclose(m["coordinates"], p3d[:40], rtol=1e-6)
    assert m["cloud"]["position"].shape[0] == 50
