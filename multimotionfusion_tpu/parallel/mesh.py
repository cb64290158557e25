"""Device mesh helpers.

The reference is a single-process, single-GPU system with no distributed
runtime at all (SURVEY.md §2.10/§5.8). The TPU build's parallel axes are:

- ``models``: each rigid-body model's tracking/fusion is independent per frame
  (the reference runs them in a sequential per-model loop,
  MultiMotionFusion.cpp:312-387) — an embarrassingly parallel axis that maps
  onto ICI-connected chips;
- surfel-array sharding within one model (for maps far beyond one chip's HBM)
  is layered separately.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "models") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


def model_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (model-batch) sharding."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
