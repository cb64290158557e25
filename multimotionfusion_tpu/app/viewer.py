"""Headless map viewer: render the surfel maps from arbitrary viewpoints.

Counterpart of the reference's Pangolin 3D viewport (GUI/Tools/GUI.h,
Core/Shaders/draw_global_surface.vert/.frag/.geom): instead of a GL window,
the engine's own splat renderer (ops/rasterize — the same code path that
produces tracking predictions) renders colour / normal-shaded / depth views
to PNG files or an MP4 orbit video. This keeps one rendering implementation
for tracking AND visualisation, where the reference maintains separate
draw_* shader programs.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from multimotionfusion_tpu.config import CameraModel
from multimotionfusion_tpu.model import surfel_map as sm
from multimotionfusion_tpu.ops import rasterize


def render_view(
    smap: sm.SurfelMap,
    view_pose: np.ndarray,  # [4,4] camera->world of the VIEW
    cam: CameraModel,
    conf_threshold: float = 0.0,
    time: int = 1 << 30,
    time_delta: int = 1 << 30,
    max_depth: float = 50.0,
    shaded: bool = True,
    light_dir=(0.3, -0.4, -0.85),
) -> dict:
    """Render one viewpoint. Returns dict with uint8 'color', 'normal',
    float32 'depth' and bool 'valid' arrays (host-side)."""
    import jax.numpy as jnp

    pred = rasterize.splat_predict(
        smap, jnp.asarray(view_pose, jnp.float32), cam, conf_threshold,
        time, time, time_delta, max_depth,
    )
    color = np.asarray(pred.color)
    normal = np.asarray(pred.normal_rad[..., :3])
    depth = np.asarray(pred.vertex_conf[..., 2])
    valid = np.asarray(pred.valid)
    if shaded:
        # simple Lambertian shading along a headlight-ish direction
        # (draw_global_surface.frag "phong" variant)
        light = np.asarray(light_dir, np.float32)
        light = light / np.linalg.norm(light)
        ndl = np.abs(normal @ light)
        shade = (0.25 + 0.75 * ndl)[..., None]
        color = color * shade
    color = np.where(valid[..., None], color, 40.0)
    nvis = np.where(valid[..., None], (normal * 0.5 + 0.5) * 255.0, 0.0)
    return {
        "color": np.clip(color, 0, 255).astype(np.uint8),
        "normal": np.clip(nvis, 0, 255).astype(np.uint8),
        "depth": depth,
        "valid": valid,
    }


def colorize_labels(mask: np.ndarray) -> np.ndarray:
    """Label image -> RGB (int_to_color.frag / color_table.glsl parity)."""
    table = np.array(
        [
            [64, 64, 64], [255, 99, 71], [100, 149, 237], [60, 179, 113],
            [255, 215, 0], [186, 85, 211], [0, 206, 209], [244, 164, 96],
            [219, 112, 147], [154, 205, 50], [176, 196, 222], [255, 140, 0],
        ],
        np.uint8,
    )
    return table[np.asarray(mask) % len(table)]


def depth_norm(depth: np.ndarray, max_depth: float = 5.0) -> np.ndarray:
    """Depth visualisation (depth_norm.frag parity): near=bright."""
    d = np.asarray(depth)
    v = np.where(d > 0, 255.0 * (1.0 - np.clip(d / max_depth, 0, 1)), 0.0)
    return np.repeat(v[..., None], 3, axis=-1).astype(np.uint8)


def orbit_poses(
    center: np.ndarray, radius: float, n: int = 60, elevation: float = 0.35
) -> Sequence[np.ndarray]:
    """Camera poses orbiting `center`, all looking at it."""
    out = []
    for i in range(n):
        a = 2.0 * np.pi * i / n
        eye = center + radius * np.array(
            [np.sin(a) * np.cos(elevation), -np.sin(elevation),
             -np.cos(a) * np.cos(elevation)]
        )
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        T = np.eye(4, dtype=np.float32)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, -up2, fwd, eye
        out.append(T)
    return out


def save_png(path: str, rgb: np.ndarray) -> str:
    import cv2

    cv2.imwrite(path, np.asarray(rgb)[..., ::-1])
    return path


def snapshot(engine, out_dir: str, prefix: str = "view",
             conf_threshold: Optional[float] = None) -> list:
    """Write colour/normal/depth renders of the current state from the
    current camera pose (GUI 'save view' parity). conf_threshold defaults to
    the engine's; pass 0 to include young (unstable) surfels."""
    os.makedirs(out_dir, exist_ok=True)
    state = engine.state
    if conf_threshold is None:
        conf_threshold = engine.cfg.surfels.conf_threshold
    view = render_view(
        state.smap, np.asarray(state.pose), engine.cam,
        conf_threshold=conf_threshold,
        time=engine.tick, time_delta=engine.cfg.surfels.time_delta,
    )
    paths = []
    for k in ("color", "normal"):
        paths.append(save_png(os.path.join(out_dir, f"{prefix}-{k}.png"), view[k]))
    paths.append(
        save_png(
            os.path.join(out_dir, f"{prefix}-depth.png"),
            depth_norm(view["depth"]),
        )
    )
    if engine.mstate is not None:
        paths.append(
            save_png(
                os.path.join(out_dir, f"{prefix}-labels.png"),
                colorize_labels(np.asarray(engine.mstate.prev_mask)),
            )
        )
    return paths


def orbit_video(
    engine,
    out_path: str,
    n_frames: int = 60,
    radius: Optional[float] = None,
    fps: int = 15,
    conf_threshold: Optional[float] = None,
) -> str:
    """Render an orbit around the map centroid to MP4 (GUI fly-around)."""
    import cv2
    import jax.numpy as jnp

    state = engine.state
    smap = state.smap
    alive = np.asarray(smap.alive_mask())
    pos = np.asarray(smap.data[sm.POS]).T[alive]
    if len(pos) == 0:
        raise RuntimeError("empty map")
    center = pos.mean(axis=0)
    if radius is None:
        radius = float(np.percentile(np.linalg.norm(pos - center, axis=1), 90)) * 2.2
    cam = engine.cam
    vw = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (cam.width, cam.height)
    )
    if conf_threshold is None:
        conf_threshold = engine.cfg.surfels.conf_threshold
    for T in orbit_poses(center, radius, n_frames):
        view = render_view(
            smap, T, cam, conf_threshold=conf_threshold,
            time=engine.tick, time_delta=engine.cfg.surfels.time_delta,
        )
        vw.write(view["color"][..., ::-1])
    vw.release()
    return out_path
