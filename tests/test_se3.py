import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from multimotionfusion_tpu.utils import se3


def random_rotvecs(rng, n):
    return rng.normal(size=(n, 3)) * rng.uniform(0.1, 2.5, size=(n, 1))


def test_so3_exp_matches_scipy(rng):
    w = random_rotvecs(rng, 32).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_exp_small_angle(rng):
    w = (rng.normal(size=(8, 3)) * 1e-10).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-6)


def test_so3_log_roundtrip(rng):
    # principal-value roundtrip only holds for |w| < pi
    w = random_rotvecs(rng, 32).astype(np.float32)
    w = w / np.linalg.norm(w, axis=1, keepdims=True) * rng.uniform(0.05, 3.0, size=(32, 1))
    w = w.astype(np.float32)
    R = se3.so3_exp(jnp.asarray(w))
    w2 = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=1e-3)
    # exp(log(R)) == R even for larger angles
    w_big = random_rotvecs(rng, 16).astype(np.float32) * 2.0
    R_big = se3.so3_exp(jnp.asarray(w_big))
    R_rt = se3.so3_exp(se3.so3_log(R_big))
    np.testing.assert_allclose(np.asarray(R_rt), np.asarray(R_big), atol=1e-3)


def test_se3_inverse(rng):
    w = random_rotvecs(rng, 4).astype(np.float32)
    t = rng.normal(size=(4, 3)).astype(np.float32)
    T = se3.make_T(se3.so3_exp(jnp.asarray(w)), jnp.asarray(t))
    Tinv = se3.inverse_T(T)
    prod = np.asarray(jnp.einsum("bij,bjk->bik", T, Tinv))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-5)


def test_gn_update_pose_convention():
    # zero update is identity
    T = jnp.eye(4)
    x = jnp.zeros(6)
    np.testing.assert_allclose(np.asarray(se3.gn_update_pose(T, x)), np.eye(4), atol=1e-7)
    # translation-only update premultiplies
    x = jnp.array([0.1, 0.0, 0.0, 0.0, 0.0, 0.0])
    out = np.asarray(se3.gn_update_pose(T, x))
    assert abs(out[0, 3] - 0.1) < 1e-7


def test_quaternion_export(rng):
    w = random_rotvecs(rng, 1)[0].astype(np.float32)
    R = se3.so3_exp(jnp.asarray(w))
    q = np.asarray(se3.to_quaternion_xyzw(R))
    q_ref = Rotation.from_rotvec(w).as_quat()
    # sign ambiguity
    if np.dot(q, q_ref) < 0:
        q = -q
    np.testing.assert_allclose(q, q_ref, atol=1e-4)
