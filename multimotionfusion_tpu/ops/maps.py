"""Vertex/normal map generation and manipulation.

TPU counterparts of the reference CUDA kernels in Core/Cuda/cudafuncs.cu:
createVMap (:109-150), createNMap (:152-205), tranformMaps (:207-269),
resizeVMap/resizeNMap (:367-445), verticesToDepth (:602-622),
projectToPointCloud (:729-762).

Conventions (differ from reference deliberately):
- maps are [H, W, 3] float32 (channel-last), not three stacked row blocks;
- invalid entries are all-zero with validity derived as `v[..., 2] > 0` for
  vertex maps and `|n| > 0` for normal maps, instead of NaN poisoning — this
  keeps every consumer branch-free under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.config import CameraModel


def pixel_grid(h: int, w: int, dtype=jnp.float32):
    """(x, y) integer pixel coordinate grids of shape [H, W]."""
    ys = jnp.arange(h, dtype=dtype)[:, None]
    xs = jnp.arange(w, dtype=dtype)[None, :]
    return jnp.broadcast_to(xs, (h, w)), jnp.broadcast_to(ys, (h, w))


def backproject(depth: jnp.ndarray, cam: CameraModel) -> jnp.ndarray:
    """Depth [H,W] -> camera-frame points [H,W,3] (zeros stay zeros).

    == projectToPointCloud (cudafuncs.cu:729-762), but keeps z=0 for invalid.
    """
    h, w = depth.shape
    x, y = pixel_grid(h, w, depth.dtype)
    px = depth * (x - cam.cx) * (1.0 / cam.fx)
    py = depth * (y - cam.cy) * (1.0 / cam.fy)
    return jnp.stack([px, py, depth], axis=-1)


def create_vmap(
    depth: jnp.ndarray,
    cam: CameraModel,
    depth_cutoff: float,
    mask: jnp.ndarray | None = None,
    mask_id: int | jnp.ndarray = 0,
) -> jnp.ndarray:
    """Vertex map from depth (+ optional per-model mask gating).

    == createVMap (cudafuncs.cu:109-150). The reference has the mask test
    commented out ("FIXME"); we support it behind `mask is not None` so
    per-model masked odometry (maskID semantics) is expressible at this level.
    """
    valid = (depth > 0) & (depth < depth_cutoff)
    if mask is not None:
        valid = valid & (mask == mask_id)
    v = backproject(jnp.where(valid, depth, 0.0), cam)
    return jnp.where(valid[..., None], v, 0.0)


def create_nmap(vmap: jnp.ndarray) -> jnp.ndarray:
    """Normal map via right/down finite differences.

    == createNMap (cudafuncs.cu:152-205): n = normalize((v01-v00) x (v10-v00)),
    invalid on the last row/column or when any participant is invalid.
    """
    v00 = vmap
    v01 = jnp.pad(vmap[:, 1:], ((0, 0), (0, 1), (0, 0)))
    v10 = jnp.pad(vmap[1:], ((0, 1), (0, 0), (0, 0)))
    valid = (v00[..., 2] > 0) & (v01[..., 2] > 0) & (v10[..., 2] > 0)
    n = jnp.cross(v01 - v00, v10 - v00)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(norm > 1e-12, n / jnp.maximum(norm, 1e-12), 0.0)
    return jnp.where(valid[..., None], n, 0.0)


def transform_maps(vmap: jnp.ndarray, nmap: jnp.ndarray, T: jnp.ndarray):
    """Rigidly transform a vertex map and rotate a normal map.

    == tranformMaps (cudafuncs.cu:207-269). Invalid entries stay zero.
    """
    R = T[:3, :3]
    t = T[:3, 3]
    v_valid = vmap[..., 2:3] > 0
    n_valid = jnp.sum(nmap * nmap, axis=-1, keepdims=True) > 0
    hi = jax.lax.Precision.HIGHEST  # geometry must not round through bf16
    v_out = jnp.einsum("ij,hwj->hwi", R, vmap, precision=hi) + t
    n_out = jnp.einsum("ij,hwj->hwi", R, nmap, precision=hi)
    return jnp.where(v_valid, v_out, 0.0), jnp.where(n_valid, n_out, 0.0)


def _resize_half(m: jnp.ndarray, normalize: bool) -> jnp.ndarray:
    """2x2 average downsample; any invalid participant invalidates the output.

    == resizeMapKernel (cudafuncs.cu:367-417) with NaN -> zero-validity.
    """
    h, w, _ = m.shape
    h2, w2 = h // 2, w // 2
    m = m[: h2 * 2, : w2 * 2]
    blocks = m.reshape(h2, 2, w2, 2, 3)
    # validity: for vmaps z>0; for nmaps nonzero vector. Use "any nonzero channel".
    vmask = jnp.any(blocks != 0, axis=-1)  # [h2, 2, w2, 2]
    all_valid = jnp.all(jnp.all(vmask, axis=1), axis=-1)  # [h2, w2]
    avg = blocks.mean(axis=(1, 3))
    if normalize:
        norm = jnp.linalg.norm(avg, axis=-1, keepdims=True)
        avg = jnp.where(norm > 1e-12, avg / jnp.maximum(norm, 1e-12), 0.0)
    return jnp.where(all_valid[..., None], avg, 0.0)


def resize_vmap(vmap: jnp.ndarray) -> jnp.ndarray:
    return _resize_half(vmap, normalize=False)


def resize_nmap(nmap: jnp.ndarray) -> jnp.ndarray:
    return _resize_half(nmap, normalize=True)


def vertices_to_depth(vmap: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """z channel of a vertex map, gated to (0, cutoff].

    == verticesToDepthKernel (cudafuncs.cu:602-622), NaN -> 0.
    """
    z = vmap[..., 2]
    return jnp.where((z > 0) & (z <= cutoff), z, 0.0)


def bilinear_sample_valid(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Validity-aware bilinear sampling of a map at float pixel coords.

    A tap is valid when its last-channel-wise vector is nonzero (the map
    convention for invalid entries); the sample is valid only if ALL four taps
    are valid and in bounds — conservative, so interpolation never bleeds
    across depth discontinuities. Returns (value, ok).

    This deliberately upgrades the reference's nearest-pixel gathers
    (reduce.cu __float2int_rn association): nearest-pixel point-to-plane
    residuals on curved surfaces carry a systematic lateral^2/(2R) curvature
    bias that the GN solve amplifies, and integer photometric warps make
    sub-pixel motion invisible. Bilinear association removes both.
    """
    h, w = img.shape[:2]
    scalar = img.ndim == 2
    if scalar:
        img = img[..., None]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    inb = (u0i >= 0) & (v0i >= 0) & (u0i < w - 1) & (v0i < h - 1)
    u0c = jnp.clip(u0i, 0, w - 2)
    v0c = jnp.clip(v0i, 0, h - 2)

    def tap(dv, du):
        return img[v0c + dv, u0c + du]

    t00, t01, t10, t11 = tap(0, 0), tap(0, 1), tap(1, 0), tap(1, 1)
    ok = (
        inb
        & jnp.any(t00 != 0, -1)
        & jnp.any(t01 != 0, -1)
        & jnp.any(t10 != 0, -1)
        & jnp.any(t11 != 0, -1)
    )
    val = (
        t00 * (1 - fu) * (1 - fv)
        + t01 * fu * (1 - fv)
        + t10 * (1 - fu) * fv
        + t11 * fu * fv
    )
    val = jnp.where(ok[..., None], val, 0.0)
    if scalar:
        val = val[..., 0]
    return val, ok


def project(points: jnp.ndarray, cam: CameraModel):
    """Camera-frame points [..., 3] -> (u, v) float pixel coords."""
    z = points[..., 2]
    safe_z = jnp.where(z != 0, z, 1.0)
    u = points[..., 0] * cam.fx / safe_z + cam.cx
    v = points[..., 1] * cam.fy / safe_z + cam.cy
    return u, v
