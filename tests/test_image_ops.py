import jax.numpy as jnp
import numpy as np

from multimotionfusion_tpu.ops import image as imops


def test_rgb_to_intensity_range(rng):
    rgb = rng.uniform(0, 255, size=(16, 16, 3)).astype(np.float32)
    out = np.asarray(imops.rgb_to_intensity(jnp.asarray(rgb)))
    assert out.shape == (16, 16)
    assert out.min() >= 0 and out.max() <= 255
    # BGR-ordered weights on RGB data (reference quirk)
    expected = np.floor(rgb[..., 0] * 0.114 + rgb[..., 1] * 0.299 + rgb[..., 2] * 0.587)
    np.testing.assert_allclose(out, expected, atol=1e-3)


def test_pyr_down_constant_image():
    img = jnp.full((32, 32), 2.5)
    out = np.asarray(imops.pyr_down_gauss(img))
    assert out.shape == (16, 16)
    np.testing.assert_allclose(out, 2.5, atol=1e-5)


def test_pyr_down_ignores_invalid():
    # half the image invalid (0); valid half must keep its value exactly
    img = np.full((32, 32), 3.0, np.float32)
    img[:, :16] = 0.0
    out = np.asarray(imops.pyr_down_gauss(jnp.asarray(img)))
    np.testing.assert_allclose(out[:, 10:], 3.0, atol=1e-5)
    np.testing.assert_allclose(out[:, :7], 0.0, atol=1e-5)


def test_sobel_on_ramp():
    # horizontal ramp -> constant dx, zero dy (away from borders)
    x = np.arange(32, dtype=np.float32)
    img = np.broadcast_to(x, (32, 32)).copy()
    dx, dy = imops.sobel_gradients(jnp.asarray(img))
    dx, dy = np.asarray(dx), np.asarray(dy)
    interior = (slice(2, -2), slice(2, -2))
    # kernel x-response on unit ramp: (0.52201*2+0.79451)*2 = 3.67706 -> trunc 3
    np.testing.assert_allclose(dx[interior], 3.0, atol=1e-4)
    np.testing.assert_allclose(dy[interior], 0.0, atol=1e-4)


def test_bilateral_preserves_edges():
    img = np.full((32, 32), 1.0, np.float32)
    img[:, 16:] = 2.0
    out = np.asarray(imops.bilateral_depth_filter(jnp.asarray(img)))
    # step edge should stay sharp to within sigma_color
    assert abs(out[5, 5] - 1.0) < 0.02
    assert abs(out[5, 25] - 2.0) < 0.02


def test_bilateral_range_gates():
    img = np.full((8, 8), 0.1, np.float32)  # below min_depth 0.3
    out = np.asarray(imops.bilateral_depth_filter(jnp.asarray(img)))
    np.testing.assert_allclose(out, 0.0)


def test_bilinear_sample_identity(rng):
    img = rng.normal(size=(8, 8)).astype(np.float32)
    xs, ys = np.meshgrid(np.arange(8, dtype=np.float32), np.arange(8, dtype=np.float32))
    out = np.asarray(imops.bilinear_sample(jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys)))
    np.testing.assert_allclose(out, img, atol=1e-6)
