"""Image-space ops: intensity conversion, pyramids, gradients, bilateral filter.

TPU re-design of the reference's CUDA image kernels (Core/Cuda/cudafuncs.cu) and
GLSL compute passes (Core/Shaders/depth_bilateral_metric.frag). Everything is a
pure function on [H, W] / [H, W, C] float32 arrays; invalid depth is encoded as
0.0 (the reference mixes NaN and 0 — we normalise to 0 and keep explicit
validity predicates `depth > 0`).

All stencils are expressed as XLA convolutions / patch extractions so they fuse
and tile well on the VPU instead of the reference's hand-rolled per-pixel loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 5x5 binomial kernel used by all reference pyramid downsamples
# (cudafuncs.cu:517-521)
_GAUSS5 = np.outer([1.0, 4.0, 6.0, 4.0, 1.0], [1.0, 4.0, 6.0, 4.0, 1.0])

# "Gaussian Sobel" derivative kernels (cudafuncs.cu computeDerivativeImages).
# The reference applies its kernel with a DECREMENTING index (true convolution);
# XLA convs are cross-correlations, so the antisymmetric kernels are negated to
# give the same positive-rightward/downward gradient sign.
_SOBEL_X = np.array(
    [
        [-0.52201, 0.00000, 0.52201],
        [-0.79451, 0.00000, 0.79451],
        [-0.52201, 0.00000, 0.52201],
    ],
    dtype=np.float32,
)
_SOBEL_Y = _SOBEL_X.T.copy()


def rgb_to_intensity(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB [H,W,3] (0..255) -> intensity [H,W] float32 in 0..255.

    Matches bgr2IntensityKernel (cudafuncs.cu:624-637): weights are applied in
    BGR order to RGB channels (a reference quirk kept for behavioural parity);
    the int truncation of the uchar store is reproduced with floor().
    """
    v = rgb[..., 0] * 0.114 + rgb[..., 1] * 0.299 + rgb[..., 2] * 0.587
    return jnp.floor(v)


def decimate2(img: jnp.ndarray) -> jnp.ndarray:
    """img[..., ::2, ::2] without the TPU lane-stride trap.

    A stride-2 slice on the minor (lane) axis lowers to a gather (~0.8 ms per
    640x480 image); instead the row stride runs on sublanes (cheap) and the
    column stride is a one-hot selection matmul on the MXU (~0.1 ms for a
    whole channel stack). The barrier hides the one-hot structure from the
    algebraic simplifier, which would rewrite the dot straight back into the
    gather this exists to avoid. Exact for ints below 2^24.
    """
    w = img.shape[-1]
    rows = img[..., ::2, :]
    dt = img.dtype
    calc = jnp.float32 if img.dtype in (jnp.int32, jnp.bool_) else img.dtype
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 0)
        == 2 * jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 1)
    ).astype(calc)
    sel = jax.lax.optimization_barrier(sel)
    # HIGHEST: default TPU matmul precision is bf16, which would round the
    # selected VALUES (ids, depths) — the selection must be exact
    out = jax.lax.dot_general(
        rows.astype(calc).reshape(-1, w), sel, (((1,), (0,)), ((), ())),
        preferred_element_type=calc,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(rows.shape[:-1] + (w // 2,))
    return out.astype(dt)


def _conv2d(img: jnp.ndarray, kernel: np.ndarray, stride: int = 1) -> jnp.ndarray:
    """Zero-padded 2D convolution (cross-correlation) of [H,W] by [k,k].

    Implemented as an unrolled shift-accumulate, NOT lax.conv: a C=1 conv
    cannot use the MXU, and XLA lowers it through an im2col materialisation
    (~1 ms per call at 640x480 on TPU v5e) whereas the shifted adds fuse into
    a single VPU loop over the image.
    """
    k = kernel.shape[0]
    r = k // 2
    out = jnp.zeros_like(img)
    for oy in range(-r, k - r):
        for ox in range(-r, k - r):
            wgt = float(kernel[oy + r, ox + r])
            if wgt == 0.0:
                continue
            out = out + wgt * _shift2d(img, oy, ox)
    if stride == 2:
        out = decimate2(out)
    elif stride != 1:
        out = out[::stride, ::stride]
    return out


def pyr_down_gauss(img: jnp.ndarray, valid_gate: float = 0.0) -> jnp.ndarray:
    """Validity-renormalised 5x5 Gaussian downsample by 2.

    Mirrors pyrDownGaussKernel / pyrDownKernelIntensityGauss: taps with value
    <= valid_gate (invalid depth / black) are excluded and the kernel mass is
    renormalised over the remaining taps. Output pixel (x, y) is centred on
    input (2x, 2y).
    """
    valid = (img > valid_gate).astype(img.dtype)
    num = _conv2d(img * valid, _GAUSS5, stride=2)
    den = _conv2d(valid, _GAUSS5, stride=2)
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-12), 0.0)


def pyr_down_nearest(img: jnp.ndarray) -> jnp.ndarray:
    """Nearest (top-left) downsample by 2 — used for label/mask images.

    The reference Gaussian-averages mask bytes (pyrDownUcharGauss on masks,
    RGBDOdometry.cpp:190) which corrupts label ids at boundaries before the
    `mask == id` test; nearest sampling keeps ids exact and is the conservative
    TPU-native choice.
    """
    return decimate2(img)


def build_pyramid(img: jnp.ndarray, levels: int, valid_gate: float = 0.0):
    """List of `levels` images, level 0 = input, each subsequent halved."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down_gauss(pyr[-1], valid_gate))
    return pyr


def build_pyramid_nearest(img: jnp.ndarray, levels: int):
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down_nearest(pyr[-1]))
    return pyr


def sobel_gradients(intensity: jnp.ndarray):
    """(dI/dx, dI/dy) with the reference's Gaussian-Sobel taps.

    Output is in the reference's un-scaled short units; multiply by
    OdometryConfig.sobel_scale (1/8) where the reference does (rgbStep).
    The reference truncates to int16 — reproduced so gradient-magnitude gates
    see identical values.
    """
    dx = jnp.trunc(_conv2d(intensity, _SOBEL_X))
    dy = jnp.trunc(_conv2d(intensity, _SOBEL_Y))
    return dx, dy


@functools.partial(jax.jit, static_argnames=("radius",))
def bilateral_depth_filter(
    depth: jnp.ndarray,
    max_depth: float = 20.0,
    min_depth: float = 0.3,
    sigma_space2_inv_half: float = 0.024691358,
    sigma_color2_inv_half: float = 555.556,
    radius: int = 6,
) -> jnp.ndarray:
    """Bilateral depth filter (depth_bilateral_metric.frag).

    13x13 window, sigma_space ~ 4.5 px, sigma_color ~ 0.03 m. Pixels outside
    [min_depth, max_depth] map to 0 (invalid). Implemented as an unrolled
    shifted-accumulate so XLA keeps one [H, W] accumulator pair live instead of
    materialising 169 patch planes.
    """
    d = radius
    valid = (depth >= min_depth) & (depth <= max_depth)
    base = jnp.where(valid, depth, 0.0)

    sum1 = jnp.zeros_like(depth)
    sum2 = jnp.zeros_like(depth)
    for oy in range(-d, d + 1):
        for ox in range(-d, d + 1):
            shifted = _shift2d(base, oy, ox)
            space2 = float(ox * ox + oy * oy)
            color2 = (base - shifted) ** 2
            w = jnp.exp(-(space2 * sigma_space2_inv_half + color2 * sigma_color2_inv_half))
            w = jnp.where(shifted > 0, w, 0.0)
            sum1 = sum1 + shifted * w
            sum2 = sum2 + w
    out = jnp.where(sum2 > 0, sum1 / jnp.maximum(sum2, 1e-12), 0.0)
    return jnp.where(valid, out, 0.0)


def _shift2d(img: jnp.ndarray, oy: int, ox: int) -> jnp.ndarray:
    """Shift with zero fill: out[y, x] = img[y + oy, x + ox]."""
    h, w = img.shape
    padded = jnp.pad(img, ((max(0, -oy), max(0, oy)), (max(0, -ox), max(0, ox))))
    return jax.lax.dynamic_slice(padded, (max(0, oy), max(0, ox)), (h, w))


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int) -> jnp.ndarray:
    """Separable Gaussian blur (used by optical flow / CRF pairwise terms)."""
    xs = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-(xs**2) / (2.0 * sigma**2))
    k /= k.sum()
    # separable: horizontal then vertical
    kx = jnp.asarray(k, img.dtype)
    padded = jnp.pad(img, ((0, 0), (radius, radius)))
    out = jnp.zeros_like(img)
    for i in range(2 * radius + 1):
        out = out + kx[i] * jax.lax.dynamic_slice(padded, (0, i), img.shape)
    padded = jnp.pad(out, ((radius, radius), (0, 0)))
    out2 = jnp.zeros_like(img)
    for i in range(2 * radius + 1):
        out2 = out2 + kx[i] * jax.lax.dynamic_slice(padded, (i, 0), img.shape)
    return out2


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation of [H,W] or [H,W,C] at float pixel coords (x, y).

    Out-of-bounds samples clamp to the border (GL_CLAMP_TO_EDGE semantics used
    by the reference's texture fetches).
    """
    h, w = img.shape[:2]
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0.astype(img.dtype))
    fy = (y - y0.astype(img.dtype))
    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


@functools.lru_cache(maxsize=64)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] separable bilinear-resize weights (align corners=False).

    Rows carry the same two clamped-edge taps bilinear_sample would blend, so
    resize-as-matmul is numerically the gather path re-associated.
    """
    xs = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    xs = np.clip(xs, 0.0, n_in - 1.0)
    x0 = np.floor(xs).astype(np.int64)
    f = (xs - x0).astype(np.float32)
    x1 = np.minimum(x0 + 1, n_in - 1)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), x0] += 1.0 - f
    m[np.arange(n_out), x1] += f
    return m


def resize_bilinear(img: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Resize [H,W(,C)] to out_hw with bilinear sampling (align corners=False).

    Fixed-grid resizing is a separable linear map, so it runs as two small
    matmuls on the MXU instead of the 4-corner gather `bilinear_sample` path
    (a 640x480 -> 160x120 gather-resize measured 0.19 ms on TPU; the matmul
    form is ~10x cheaper and frees the gather unit for data-dependent work).
    """
    oh, ow = out_hw
    h, w = img.shape[:2]
    my = jnp.asarray(_resize_matrix(h, oh))  # [oh, h]
    mx = jnp.asarray(_resize_matrix(w, ow))  # [ow, w]
    hi = jax.lax.Precision.HIGHEST
    if img.ndim == 2:
        return jnp.einsum("ab,bw,cw->ac", my, img.astype(jnp.float32), mx,
                          precision=hi).astype(img.dtype)
    return jnp.einsum("ab,bwk,cw->ack", my, img.astype(jnp.float32), mx,
                      precision=hi).astype(img.dtype)
