import jax.numpy as jnp
import numpy as np

from multimotionfusion_tpu.config import CameraModel
from multimotionfusion_tpu.ops import maps
from multimotionfusion_tpu.utils import se3

CAM = CameraModel(width=64, height=48, fx=60.0, fy=60.0, cx=32.0, cy=24.0)


def flat_depth(z=1.5):
    return jnp.full((CAM.height, CAM.width), z, jnp.float32)


def test_backproject_project_roundtrip():
    depth = flat_depth()
    v = maps.backproject(depth, CAM)
    u, w = maps.project(v, CAM)
    xs, ys = maps.pixel_grid(CAM.height, CAM.width)
    np.testing.assert_allclose(np.asarray(u), np.asarray(xs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(w), np.asarray(ys), atol=1e-4)


def test_create_vmap_cutoff():
    depth = flat_depth(5.0)
    v = maps.create_vmap(depth, CAM, depth_cutoff=3.0)
    np.testing.assert_allclose(np.asarray(v), 0.0)


def test_create_nmap_plane():
    # flat z-plane -> normal (0, 0, +1) with the reference cross-product order
    # (createNMap: n = normalize((v01-v00) x (v10-v00)), +x cross +y = +z)
    v = maps.create_vmap(flat_depth(), CAM, depth_cutoff=10.0)
    n = np.asarray(maps.create_nmap(v))
    interior = n[:-1, :-1]
    np.testing.assert_allclose(interior[..., 2], 1.0, atol=1e-4)
    # last row/col invalid
    np.testing.assert_allclose(n[-1], 0.0)


def test_transform_maps_rigid():
    v = maps.create_vmap(flat_depth(), CAM, depth_cutoff=10.0)
    n = maps.create_nmap(v)
    T = se3.make_T(se3.so3_exp(jnp.array([0.1, -0.2, 0.3])), jnp.array([0.5, 0.0, 1.0]))
    v2, n2 = maps.transform_maps(v, n, T)
    # distances preserved for a pair of points
    p_a = np.asarray(v[10, 10])
    p_b = np.asarray(v[20, 30])
    q_a = np.asarray(v2[10, 10])
    q_b = np.asarray(v2[20, 30])
    np.testing.assert_allclose(
        np.linalg.norm(p_a - p_b), np.linalg.norm(q_a - q_b), rtol=1e-3
    )
    # normals stay unit where valid
    norms = np.linalg.norm(np.asarray(n2[:-1, :-1]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_resize_vmap_halves():
    v = maps.create_vmap(flat_depth(), CAM, depth_cutoff=10.0)
    v2 = maps.resize_vmap(v)
    assert v2.shape == (CAM.height // 2, CAM.width // 2, 3)
    np.testing.assert_allclose(np.asarray(v2[..., 2]), 1.5, atol=1e-5)
