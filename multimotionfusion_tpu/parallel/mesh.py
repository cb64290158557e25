"""Device mesh helpers.

The reference is a single-process, single-GPU system with no distributed
runtime at all (SURVEY.md §2.10/§5.8). The TPU build's parallel axes are:

- ``models``: each rigid-body model's tracking/fusion is independent per frame
  (the reference runs them in a sequential per-model loop,
  MultiMotionFusion.cpp:312-387) — an embarrassingly parallel axis that maps
  onto ICI-connected chips;
- surfel-array sharding within one model (for maps far beyond one chip's HBM)
  is layered separately.

When fewer physical devices exist than requested (the common case in dev:
one tunnelled TPU chip, or a plain CPU host), ``ensure_devices`` transparently
re-provisions JAX with N virtual CPU devices so the SAME sharded program
compiles and executes — identical to the mechanism tests/conftest.py uses.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ensure_devices(n: int) -> list:
    """Return >= n devices, self-provisioning a virtual CPU backend if needed.

    On a host with fewer than n accelerator devices the JAX backend is torn
    down and re-initialised as a CPU platform with n virtual devices
    (``jax_num_cpu_devices``). Safe to call before OR after backend init.
    """
    devs = jax.devices()
    if len(devs) >= n:
        return devs
    # keep subprocesses (if any) consistent with the new topology
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    from jax.extend import backend as jeb

    jeb.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)
    devs = jax.devices()
    if len(devs) < n:
        raise RuntimeError(
            f"could not provision {n} virtual CPU devices (got {len(devs)})"
        )
    return devs


def make_mesh(n_devices: int | None = None, axis: str = "models") -> Mesh:
    n = n_devices or len(jax.devices())
    devs = ensure_devices(n)
    return Mesh(np.asarray(devs[:n]), (axis,))


def model_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (model-batch) sharding."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
