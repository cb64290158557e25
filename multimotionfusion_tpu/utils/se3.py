"""SE(3)/SO(3) utilities (jit-safe, float32/float64-agnostic).

Re-derivation of the reference's pose math:
- `so3_exp` == OdometryProvider::rodrigues (Core/Utils/OdometryProvider.h:32-67)
- `se3_update` == OdometryProvider::computeUpdateSE3 (:69-89): given a GN solution
  x = [t; r], premultiply the running increment by [R(r), t].
- `Model::rodrigues2` (Core/Model/Model.cpp:1301-1342) is the log map, `so3_log`.

All functions are branch-free (jnp.where on the small-angle path) so they can sit
inside jitted loops, unlike the reference's eps-guarded scalar code.
"""

from __future__ import annotations

import jax.numpy as jnp


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector."""
    zero = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zero, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: axis-angle vector -> rotation matrix.

    Small-angle safe: for theta ~ 0 returns I + hat(w) (first order), matching the
    reference's theta < eps early-out to identity within float tolerance.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < 1e-8
    safe_theta = jnp.where(small, 1.0, theta)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    a = jnp.where(small, 1.0, s / safe_theta)  # sin(t)/t
    b = jnp.where(small, 0.5, (1.0 - c) / jnp.where(small, 1.0, theta2))  # (1-cos)/t^2
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle vector (inverse Rodrigues).

    Mirrors Model::rodrigues2 including the theta ~ pi branch, but branch-free.
    """
    rx = R[..., 2, 1] - R[..., 1, 2]
    ry = R[..., 0, 2] - R[..., 2, 0]
    rz = R[..., 1, 0] - R[..., 0, 1]
    r = jnp.stack([rx, ry, rz], axis=-1)
    s = jnp.sqrt(jnp.clip(jnp.sum(r * r, axis=-1), 0.0) * 0.25)
    c = jnp.clip((R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(c)

    # generic branch: r * theta / (2 sin theta)
    sin_ok = s > 1e-5
    vth = jnp.where(sin_ok, 1.0 / jnp.where(sin_ok, 2.0 * s, 1.0), 0.0) * theta

    # theta ~ pi branch: extract axis from diagonal
    near_pi = (~sin_ok) & (c < 0)
    t = jnp.stack(
        [
            (R[..., 0, 0] + 1.0) * 0.5,
            (R[..., 1, 1] + 1.0) * 0.5,
            (R[..., 2, 2] + 1.0) * 0.5,
        ],
        axis=-1,
    )
    axis = jnp.sqrt(jnp.clip(t, 0.0))
    # fix signs from off-diagonals
    sign_y = jnp.where((R[..., 0, 1] < 0), -1.0, 1.0)
    sign_z = jnp.where((R[..., 0, 2] < 0), -1.0, 1.0)
    # guard the x~0 case (axis dominated by y/z)
    x_small = jnp.abs(axis[..., 0:1]) < 1e-6
    sign_z2 = jnp.where(
        (jnp.abs(axis[..., 1:2]) < 1e-6) & (R[..., 1:2, 2] < 0), -1.0, 1.0
    )
    axis_fixed = jnp.concatenate(
        [
            axis[..., 0:1],
            axis[..., 1:2] * jnp.where(x_small, 1.0, sign_y[..., None]),
            axis[..., 2:3]
            * jnp.where(x_small, sign_z2, sign_z[..., None]),
        ],
        axis=-1,
    )
    pi_branch = axis_fixed * theta[..., None]

    generic = r * vth[..., None]
    out = jnp.where(near_pi[..., None], pi_branch, generic)
    # tiny rotation: zero vector
    tiny = (~sin_ok) & (c > 0)
    return jnp.where(tiny[..., None], jnp.zeros_like(out), out)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Twist [t(3), w(3)] -> 4x4 transform with R=exp(w), trans=t.

    NOTE: this is the reference's "infinitesimal transformation" convention
    (OdometryProvider::computeUpdateSE3): the translation part is used directly,
    NOT through the SE(3) exponential's V-matrix. Kept for GN-update parity.
    """
    R = so3_exp(xi[..., 3:6])
    return make_T(R, xi[..., 0:3])


def make_T(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble a 4x4 homogeneous transform."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def inverse_T(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_T(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to points [..., 3]."""
    return jnp.einsum("ij,...j->...i", T[:3, :3], p) + T[:3, 3]


def rotate_vectors(T: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation of a 4x4 transform to vectors [..., 3]."""
    return jnp.einsum("ij,...j->...i", T[:3, :3], v)


def gn_update_pose(result_Rt: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """One Gauss-Newton pose update, reference convention.

    computeUpdateSE3: resultRt <- [R(x[3:6]), x[0:3]] @ resultRt.
    """
    return se3_exp(x) @ result_Rt


def to_quaternion_xyzw(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), for TUM-format pose export."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22
    qw = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12)) * 0.5
    qx = (m21 - m12) / (4.0 * qw)
    qy = (m02 - m20) / (4.0 * qw)
    qz = (m10 - m01) / (4.0 * qw)
    # NOTE: degenerate (tr <= -1) handled by clip; exporter normalises.
    q = jnp.stack([qx, qy, qz, qw])
    return q / jnp.linalg.norm(q)
