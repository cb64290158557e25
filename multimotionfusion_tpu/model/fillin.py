"""Hole-filling of predicted maps with raw frame data.

== reference Core/Shaders/FillIn.{h,cpp} + fill_rgb/fill_vertex/fill_normal.frag
(used Model.cpp:1607-1615): wherever the splatted model prediction has no
coverage (or passthrough is forced, e.g. before the model has content), fall
back to the live frame so the odometry always tracks against a complete
reference image.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from multimotionfusion_tpu.ops.rasterize import PredictedMaps


class FilledMaps(NamedTuple):
    color: jnp.ndarray  # [H, W, 3]
    vertex_conf: jnp.ndarray  # [H, W, 4] camera frame
    normal_rad: jnp.ndarray  # [H, W, 4] camera frame


def fill_in(
    pred: PredictedMaps,
    frame_rgb: jnp.ndarray,  # [H, W, 3]
    frame_vmap: jnp.ndarray,  # [H, W, 3] camera frame (raw depth)
    frame_nmap: jnp.ndarray,  # [H, W, 3]
    frame_conf: jnp.ndarray,  # [H, W] pixel confidence of the frame
    frame_rad: jnp.ndarray,  # [H, W] surfel radius of the frame
    passthrough: bool | jnp.ndarray = False,
    gate: jnp.ndarray | None = None,  # [H, W] bool: fill only where True
) -> FilledMaps:
    """`gate` (composite multi-model mode): the reference only fills in the
    GLOBAL model's prediction (Model::performFillIn is called for the global
    model alone, MultiMotionFusion.cpp:871-875); in the owner-composite
    prediction, only global-owned pixels may fall back to frame data — an
    object pixel backed by the live frame would bias its tracking to
    identity."""
    use_frame = jnp.logical_or(~pred.valid, passthrough)
    if gate is not None:
        use_frame = use_frame & gate
    use_frame = use_frame[..., None]
    color = jnp.where(use_frame, frame_rgb, pred.color)
    vc_frame = jnp.concatenate([frame_vmap, frame_conf[..., None]], axis=-1)
    nr_frame = jnp.concatenate([frame_nmap, frame_rad[..., None]], axis=-1)
    vertex_conf = jnp.where(use_frame, vc_frame, pred.vertex_conf)
    normal_rad = jnp.where(use_frame, nr_frame, pred.normal_rad)
    return FilledMaps(color=color, vertex_conf=vertex_conf, normal_rad=normal_rad)
