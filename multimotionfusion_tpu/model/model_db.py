"""Model database: persistence of deactivated object models.

== reference Model::store/load/activate (Core/Model/Model.cpp:1617-1691):
on deactivation a model's surfel cloud and its keypoint tracks (descriptors +
model-local coordinates) are written to
``<export_dir>/model_db/model-<id>/{cloud.ply, tracks.npz}``; `-restore`
pre-loads all stored models as inactive re-detection candidates
(MultiMotionFusion.cpp:131-145).

Difference from the reference: tracks are stored as an .npz of fixed arrays
instead of the reference's custom PLY `track`/`edge` elements (happly) — the
content (descriptors, model-local 3D points) is the same; the cloud stays
binary PLY. Live redetection state additionally stays ON DEVICE inside the
engine's object slots, so re-attachment does not round-trip through disk.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from multimotionfusion_tpu.io import ply


def save_model(
    export_dir: str,
    model_id: int,
    surfels: Dict[str, np.ndarray],
    track_desc: np.ndarray,  # [K, D]
    track_p3d: np.ndarray,  # [K, 3] model-local coordinates
    track_valid: np.ndarray,  # [K]
    pose_world: np.ndarray,  # [4,4] object's world pose at storage time
    conf_threshold: float = 0.0,
) -> str:
    path = os.path.join(export_dir, "model_db", f"model-{model_id}")
    os.makedirs(path, exist_ok=True)
    ply.write_surfel_ply(os.path.join(path, "cloud.ply"), surfels, conf_threshold)
    np.savez_compressed(
        os.path.join(path, "tracks.npz"),
        descriptors=track_desc[track_valid],
        coordinates=track_p3d[track_valid],
    )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"id": model_id, "pose_world": pose_world.tolist()}, f)
    return path


def load_model(path: str) -> Dict[str, np.ndarray]:
    cloud = ply.read_surfel_ply(os.path.join(path, "cloud.ply"))
    tr = np.load(os.path.join(path, "tracks.npz"))
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return {
        "cloud": cloud,
        "descriptors": tr["descriptors"],
        "coordinates": tr["coordinates"],
        "id": meta.get("id"),
        "pose_world": np.asarray(meta.get("pose_world", np.eye(4))),
    }


def list_models(export_dir: str) -> List[str]:
    root = os.path.join(export_dir, "model_db")
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith("model-") and os.path.isdir(os.path.join(root, d))
    )
