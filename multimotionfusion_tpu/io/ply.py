"""Binary PLY surfel cloud read/write.

Replaces the reference's header-only happly dependency (Core/Utils/happly.h,
used by Model::exportModelPLY / Model::store / Model::load,
Core/Model/Model.cpp:1386-1691) with a numpy structured-array codec. Layout
matches the reference cloud export: positions, normals, 8-bit colours, radius,
plus confidence (the reference encodes it implicitly by thresholding before
export; keeping it makes store/load lossless).
"""

from __future__ import annotations

import numpy as np

_DTYPE = np.dtype(
    [
        ("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
        ("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4"),
        ("red", "u1"), ("green", "u1"), ("blue", "u1"),
        ("radius", "<f4"), ("confidence", "<f4"),
    ]
)

_HEADER = """ply
format binary_little_endian 1.0
element vertex {n}
property float x
property float y
property float z
property float nx
property float ny
property float nz
property uchar red
property uchar green
property uchar blue
property float radius
property float confidence
end_header
"""


def write_surfel_ply(path: str, surfels: dict, conf_threshold: float = 0.0) -> int:
    """Write surfels (Model.download() dict) above the confidence threshold."""
    keep = surfels["confidence"] >= conf_threshold
    pos = surfels["position"][keep]
    nrm = surfels["normal"][keep]
    col = np.clip(surfels["color"][keep], 0, 255).astype(np.uint8)
    rad = surfels["radius"][keep]
    conf = surfels["confidence"][keep]
    n = pos.shape[0]
    rec = np.empty(n, dtype=_DTYPE)
    rec["x"], rec["y"], rec["z"] = pos[:, 0], pos[:, 1], pos[:, 2]
    rec["nx"], rec["ny"], rec["nz"] = nrm[:, 0], nrm[:, 1], nrm[:, 2]
    rec["red"], rec["green"], rec["blue"] = col[:, 0], col[:, 1], col[:, 2]
    rec["radius"] = rad
    rec["confidence"] = conf
    with open(path, "wb") as f:
        f.write(_HEADER.format(n=n).encode())
        f.write(rec.tobytes())
    return n


def read_surfel_ply(path: str) -> dict:
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: truncated PLY header")
            header += line
        n = int(
            next(
                l for l in header.decode().splitlines() if l.startswith("element vertex")
            ).split()[-1]
        )
        rec = np.frombuffer(f.read(n * _DTYPE.itemsize), dtype=_DTYPE)
    return {
        "position": np.stack([rec["x"], rec["y"], rec["z"]], axis=-1),
        "normal": np.stack([rec["nx"], rec["ny"], rec["nz"]], axis=-1),
        "color": np.stack([rec["red"], rec["green"], rec["blue"]], axis=-1).astype(
            np.float32
        ),
        "radius": rec["radius"].copy(),
        "confidence": rec["confidence"].copy(),
    }
