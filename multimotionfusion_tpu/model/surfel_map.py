"""Surfel map: the per-rigid-body dense model state.

TPU-native replacement for the reference's double-buffered transform-feedback
VBO pair (reference Core/Model/Model.h:247-264, Core/Model/Buffers.h): one
fixed-capacity channel-major array plus a live-count scalar. The reference
surfel is 48 bytes = 3x vec4 (position+confidence, colour+init_time+timestamp,
normal+radius); we keep the same attributes as named channels of a single
``[16, capacity]`` float32 array so every fuse/clean pass is one gather or one
scatter instead of per-attribute traffic, and so the lane dimension (capacity)
is the long one, which is what the TPU vector unit wants.

Life-cycle semantics mirror the reference:
- surfels ``[0, count)`` are alive; storage is kept dense by prefix-sum
  compaction (the reference instead relies on GL transform feedback dropping
  non-emitted vertices, Core/Shaders/copy_unstable.geom);
- ``LAST_T`` is the last-update tick (reference vColor.w), ``INIT_T`` the
  creation tick (vColor.z); both drive the active/inactive time windows;
- confidence accumulates fusion weight (reference vPosition.w).

Colour is stored as three 0..255 float channels instead of the reference's
24-bit float packing (Core/Shaders/color_encoding.glsl) — packing was a GL
attribute-slot workaround, not a feature.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from multimotionfusion_tpu.config import CameraModel

# channel indices of the surfel attribute array
PX, PY, PZ, CONF = 0, 1, 2, 3
CR, CG, CB = 4, 5, 6
INIT_T, LAST_T = 7, 8
NX, NY, NZ, RADIUS = 9, 10, 11, 12
ALIVE = 13  # 1.0 = live, 0.0 = culled/free (cleared by clean, elementwise)
CHANNELS = 16  # padded to a power of two

POS = slice(PX, PZ + 1)
COLOR = slice(CR, CB + 1)
NORMAL = slice(NX, NZ + 1)


class SurfelMap(NamedTuple):
    """One rigid body's dense map (reference Model's vbos[2], Model.h:361-363).

    ``count`` is the high-water mark: slots [0, count) have ever been used;
    a slot is live iff its ALIVE channel is set. Culls clear the flag
    (elementwise — cheap every frame); `compact` repacks the prefix and is a
    rare maintenance pass, NOT a per-frame cost like the reference's
    copy_unstable transform-feedback stream. Callers can slice work to
    data[:, :bucket] with a host-chosen power-of-two bucket >= count so
    scatter/gather costs track the live size, not the capacity.
    """

    data: jnp.ndarray  # [CHANNELS, capacity] float32
    count: jnp.ndarray  # [] int32, high-water mark

    @property
    def capacity(self) -> int:
        return self.data.shape[1]

    def alive_mask(self) -> jnp.ndarray:
        in_prefix = jnp.arange(self.capacity, dtype=jnp.int32) < self.count
        return in_prefix & (self.data[ALIVE] > 0)

    def alive_count(self) -> jnp.ndarray:
        return jnp.sum(self.alive_mask().astype(jnp.int32))

    def bucketed(self, bucket: int) -> "SurfelMap":
        """View of the first `bucket` slots (requires count <= bucket)."""
        return SurfelMap(data=self.data[:, :bucket], count=self.count)

    def positions(self) -> jnp.ndarray:
        return self.data[POS]  # [3, capacity]

    def normals(self) -> jnp.ndarray:
        return self.data[NORMAL]


def empty(capacity: int) -> SurfelMap:
    return SurfelMap(
        data=jnp.zeros((CHANNELS, capacity), jnp.float32),
        count=jnp.zeros((), jnp.int32),
    )


def radius_from_depth(depth: jnp.ndarray, norm_z: jnp.ndarray, cam: CameraModel) -> jnp.ndarray:
    """Surfel radius model (reference Core/Shaders/surfels.glsl getRadius):
    r = sqrt(2) * z / mean_focal, inflated by 1/|n_z| capped at 2x."""
    mean_focal = (abs(cam.fx) + abs(cam.fy)) / 2.0
    radius = depth * (1.4142135623730951 / mean_focal)
    radius_n = radius / jnp.maximum(jnp.abs(norm_z), 1e-6)
    return jnp.minimum(2.0 * radius, radius_n)


def pixel_confidence(cam: CameraModel, weighting) -> jnp.ndarray:
    """Radial Gaussian confidence prior (surfels.glsl confidence): pixels near
    the principal point are trusted more. Returns [H, W]."""
    ys = jnp.arange(cam.height, dtype=jnp.float32)[:, None] - cam.cy
    xs = jnp.arange(cam.width, dtype=jnp.float32)[None, :] - cam.cx
    max_rad_dist = 400.0
    two_sigma_sq = 0.72
    radial = jnp.sqrt(ys * ys + xs * xs) / max_rad_dist
    return jnp.exp(-(radial * radial) / two_sigma_sq) * weighting


class FrameSurfels(NamedTuple):
    """Per-pixel surfel candidates computed from one RGB-D frame.

    == the vertex_feedback.vert/geom feedback buffer (reference
    Core/Shaders/vertex_feedback.vert, Core/FeedbackBuffer.*): position from
    raw depth, normal/radius from filtered depth, radial confidence, colour.
    Arrays are image-shaped; ``valid`` replaces the geometry-shader discard.
    """

    data: jnp.ndarray  # [CHANNELS, H*W] float32 (camera-frame positions/normals)
    valid: jnp.ndarray  # [H*W] bool


def compute_frame_surfels(
    rgb: jnp.ndarray,  # [H, W, 3] float32 0..255
    vmap_raw: jnp.ndarray,  # [H, W, 3] from raw depth
    vmap_filt: jnp.ndarray,  # [H, W, 3] from bilateral-filtered depth
    nmap_filt: jnp.ndarray,  # [H, W, 3]
    cam: CameraModel,
    time,
    max_depth: float,
    weighting=1.0,
) -> FrameSurfels:
    h, w = rgb.shape[:2]
    n = h * w
    z = vmap_raw[..., 2]
    valid = (z > 0) & (z <= max_depth) & (jnp.sum(nmap_filt * nmap_filt, axis=-1) > 0)

    conf = pixel_confidence(cam, weighting)
    rad = radius_from_depth(vmap_filt[..., 2], nmap_filt[..., 2], cam)

    data = jnp.zeros((CHANNELS, n), jnp.float32)
    flat = lambda a: a.reshape(n)  # noqa: E731
    data = data.at[PX].set(flat(vmap_raw[..., 0]))
    data = data.at[PY].set(flat(vmap_raw[..., 1]))
    data = data.at[PZ].set(flat(z))
    data = data.at[CONF].set(flat(conf))
    data = data.at[CR].set(flat(rgb[..., 0]))
    data = data.at[CG].set(flat(rgb[..., 1]))
    data = data.at[CB].set(flat(rgb[..., 2]))
    data = data.at[INIT_T].set(jnp.float32(time))
    data = data.at[LAST_T].set(jnp.float32(time))
    data = data.at[NX].set(flat(nmap_filt[..., 0]))
    data = data.at[NY].set(flat(nmap_filt[..., 1]))
    data = data.at[NZ].set(flat(nmap_filt[..., 2]))
    data = data.at[RADIUS].set(flat(rad))
    data = data.at[ALIVE].set(valid.reshape(n).astype(jnp.float32))
    return FrameSurfels(data=data, valid=flat(valid))


def transform_surfels(data: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Rigidly transform surfel positions and rotate normals ([C, N] layout).

    Written as per-row FMAs on 1D lanes, NOT `R @ data[POS]`: multi-row slices
    and [3, N] matmuls on a [16, N] array force sublane-misaligned relayouts
    on TPU (~200x slower than the equivalent row-wise arithmetic).
    """
    R = T[:3, :3].astype(data.dtype)
    t = T[:3, 3].astype(data.dtype)
    px, py, pz = data[PX], data[PY], data[PZ]
    nx, ny, nz = data[NX], data[NY], data[NZ]
    out = data
    for i, (row_p, row_n) in enumerate(((PX, NX), (PY, NY), (PZ, NZ))):
        out = out.at[row_p].set(R[i, 0] * px + R[i, 1] * py + R[i, 2] * pz + t[i])
        out = out.at[row_n].set(R[i, 0] * nx + R[i, 1] * ny + R[i, 2] * nz)
    return out


def compact(
    data: jnp.ndarray, keep: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Keep surfels where ``keep``, packed densely to the front.

    TPU-native replacement for transform-feedback append (the GPU decides
    per-vertex whether to emit; order is preserved there too). Prefix-sum over
    the keep mask gives each survivor its destination; dropped surfels scatter
    into a scratch column that is sliced off.
    """
    keep_i = keep.astype(jnp.int32)
    dest = jnp.cumsum(keep_i) - 1
    dest = jnp.where(keep, dest, capacity)  # drops land in scratch column
    out = jnp.zeros((data.shape[0], capacity + 1), data.dtype)
    out = out.at[:, dest].set(data, mode="drop", unique_indices=True)
    return out[:, :capacity], jnp.sum(keep_i)


def append(
    smap: SurfelMap, new_data: jnp.ndarray, new_mask: jnp.ndarray
) -> SurfelMap:
    """Append masked candidate surfels after the live prefix (capacity-capped).

    == the newUnstableBuffer -> copy_unstable concatenation
    (reference Core/Model/Model.cpp:1050-1182 second draw).
    """
    cap = smap.capacity
    new_i = new_mask.astype(jnp.int32)
    dest = smap.count + jnp.cumsum(new_i) - 1
    dest = jnp.where(new_mask & (dest < cap), dest, cap)
    data = jnp.pad(smap.data, ((0, 0), (0, 1)))
    data = data.at[:, dest].set(new_data, mode="drop", unique_indices=True)[:, :cap]
    n_new = jnp.minimum(jnp.sum(new_i), cap - smap.count)
    return SurfelMap(data=data, count=smap.count + n_new)


def init_from_frame(frame: FrameSurfels, capacity: int) -> SurfelMap:
    """First-frame initialisation (reference Model::initialise, Model.cpp:267-312)."""
    data, count = compact(frame.data, frame.valid, capacity)
    return SurfelMap(data=data, count=count)
