"""Dense joint ICP + photometric RGB-D odometry (Gauss-Newton, 3-level pyramid).

TPU re-design of reference Core/Utils/RGBDOdometry.{h,cpp} + Core/Cuda/reduce.cu.

Key behavioural parity points (cited to the reference):
- schedule: SO(3) pre-alignment at level 2 (<=10 iters, divergence-reverted),
  then coarse->fine GN with iterations {10,5,4} ({3,0,0} fastOdom)
  (RGBDOdometry.cpp:239-314);
- ICP rows: projective association curr->prev, point-to-plane residual in the
  prev camera frame, row = [n, s x n | n.(s-d)] with dist/angle gates
  (reduce.cu ICPReduction::search/getProducts :257-368);
- RGB rows: inverse-depth warp correspondences (residualKernel :759-839), then
  photometric Jacobian from Sobel gradients and the last frame's point cloud
  with weight 1/(sigmaVal + |diff|) (RGBReduction :495-578);
- fusion: A = A_rgbd + w^2 A_icp, b = b_rgbd + w b_icp, solved each iteration;
  update premultiplies the running increment and the new pose is
  prev_pose @ increment^-1 (RGBDOdometry.cpp:425-460);
- divergence guard ||t_new - t_prev|| > 0.3 reverts (:464-467).

TPU-first design differences:
- the per-pixel 27-term outer products + tree reduction + 29-float host
  readback per iteration (reduce.cu:331-397) are replaced by ONE [P, 7] row
  matrix per term and a single [7, 7] = rows^T rows MXU matmul; A, b, residual
  and count all fall out of that product's blocks — no host sync at all;
- the 6x6 solve runs on-device in f32 with Jacobi (diagonal) preconditioning
  instead of host double LDLT;
- all early-exit logic is expressed as masked updates inside lax.fori_loop so
  the whole multi-level solve is one XLA program per pyramid shape.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.config import CameraModel, OdometryConfig
from multimotionfusion_tpu.ops import image as imops
from multimotionfusion_tpu.ops import maps as mapops
from multimotionfusion_tpu.utils import se3


class OdometryResult(NamedTuple):
    pose: jnp.ndarray  # [4,4] new model/camera pose
    icp_error: jnp.ndarray  # mean sqrt residual (lastICPError)
    icp_count: jnp.ndarray  # inlier count (lastICPCount)
    rgb_error: jnp.ndarray
    rgb_count: jnp.ndarray
    so3_error: jnp.ndarray
    so3_count: jnp.ndarray
    A: jnp.ndarray  # [6,6] last fused normal matrix (covariance = inv(A))
    b: jnp.ndarray  # [6]
    icp_error_image: jnp.ndarray  # [H,W] level-0 per-pixel ICP distance (segmentation input)
    rgb_error_image: jnp.ndarray  # [H,W] level-0 0.001*diff^2 (segmentation input)


class LevelData(NamedTuple):
    """Per-pyramid-level inputs for one model's tracking."""

    vmap_curr: jnp.ndarray  # [H,W,3] current frame vertices (camera frame)
    nmap_curr: jnp.ndarray  # [H,W,3]
    vmap_prev: jnp.ndarray  # [H,W,3] predicted model vertices (prediction CAMERA frame)
    nmap_prev: jnp.ndarray  # [H,W,3] (prediction camera frame)
    depth_last: jnp.ndarray  # [H,W] prediction depth (m)
    depth_next: jnp.ndarray  # [H,W] frame depth (m)
    img_last: jnp.ndarray  # [H,W] prediction intensity 0..255
    img_next: jnp.ndarray  # [H,W] frame intensity
    mask_next: jnp.ndarray  # [H,W] frame mask ids (int32)
    didx: jnp.ndarray  # [H,W] Sobel d/dx of img_next
    didy: jnp.ndarray  # [H,W]


def _gather_img(img: jnp.ndarray, v: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Gather img[v, u] with clamped indices (callers gate validity)."""
    h, w = img.shape[:2]
    v = jnp.clip(v, 0, h - 1)
    u = jnp.clip(u, 0, w - 1)
    return img[v, u]


def _system_from_rows(rows: jnp.ndarray) -> jnp.ndarray:
    """[P, 7] Jacobian|residual rows -> [7, 7] normal system via one MXU matmul."""
    return jax.lax.dot_general(
        rows,
        rows,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def solve_preconditioned(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b (SPD-ish) in f32: Jacobi scaling + eigenvalue floor.

    Replaces the reference's host-side double LDLT (RGBDOdometry.cpp:435):
    D^-1/2 A D^-1/2 y = D^-1/2 b keeps the solve well-conditioned in f32
    because ICP/RGB blocks have wildly different scales.

    Degenerate directions are handled by a truncated eigensolve, NOT by
    Tikhonov damping: near-null eigendirections (a lone sphere patch has an
    x-translation/y-rotation ambiguity that turns curvature-bias-sized
    residuals into centimetre steps) get a ZERO step, while every healthy
    direction gets the FULL Newton step. Uniform damping lambda instead
    shrinks weakly-observed-but-real directions by mu/(mu+lambda) per
    iteration — measured at 0.90 on the 640x480 camera solve — which both
    leaves a geometric tail of un-applied motion after the iteration budget
    AND defeats the convergence early-exit. The eigensolve of a Jacobi-scaled
    6x6 is exact and costs nothing next to the per-iteration gather.
    """
    d = jnp.sqrt(jnp.clip(jnp.diagonal(A), 1e-12))
    dinv = 1.0 / d
    Ah = A * dinv[:, None] * dinv[None, :]
    bh = b * dinv
    w, V = jnp.linalg.eigh(Ah)
    wmax = jnp.maximum(w[-1], 1e-12)
    inv_w = jnp.where(w > 1e-4 * wmax, 1.0 / jnp.where(w == 0, 1.0, w), 0.0)
    y = V @ (inv_w * (V.T @ bh))
    x = y * dinv
    return jnp.where(jnp.all(jnp.isfinite(x)), x, jnp.zeros_like(x))


def solve_trunc_ldlt(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Jacobi-scaled, PIVOT-CLAMPED unrolled LDLT solve of a tiny SPD system.

    Same protective semantics as solve_preconditioned's truncated eigensolve
    — a near-degenerate direction gets a ZERO step while healthy directions
    get the full Newton step — but truncation happens in the elimination
    basis (pivots < 1e-4 of the unit-scaled diagonal are zeroed out) instead
    of the eigenbasis. Why it exists: jnp.linalg.eigh lowers to XLA's
    iterative QDWH-eig — hundreds of device ops per call — and the GN loops
    call a solve per model per iteration; this unrolled n<=6 elimination is
    ~50 fused vector ops, batched over models for free. On the scaled matrix
    (unit diagonal) elimination pivots track the eigenvalue spectrum closely
    enough that the clamp fires on the same degenerate geometry (a lone
    sphere patch's translation/rotation ambiguity).
    """
    n = A.shape[-1]
    d = jnp.sqrt(jnp.clip(jnp.diagonal(A, axis1=-2, axis2=-1), 1e-12))
    dinv = 1.0 / d
    Ah = A * dinv[..., :, None] * dinv[..., None, :]
    bh = b * dinv
    # unrolled forward elimination with pivot clamping: a zeroed pivot row
    # neither eliminates nor contributes to the back-substitution
    rows = [Ah[..., i, :] for i in range(n)]
    rhs = [bh[..., i] for i in range(n)]
    xs = [None] * n
    ok = [None] * n
    for i in range(n):
        piv = rows[i][..., i]
        ok[i] = piv > 1e-4
        inv_piv = jnp.where(ok[i], 1.0 / jnp.where(ok[i], piv, 1.0), 0.0)
        for j in range(i + 1, n):
            f = rows[j][..., i] * inv_piv
            rows[j] = rows[j] - f[..., None] * rows[i]
            rhs[j] = rhs[j] - f * rhs[i]
    for i in range(n - 1, -1, -1):
        acc = rhs[i]
        for j in range(i + 1, n):
            acc = acc - rows[i][..., j] * xs[j]
        piv = rows[i][..., i]
        xs[i] = jnp.where(
            ok[i], acc / jnp.where(ok[i], piv, 1.0), 0.0
        )
    x = jnp.stack(xs, axis=-1) * dinv
    finite = jnp.all(jnp.isfinite(x), axis=-1, keepdims=True)
    return jnp.where(finite, x, 0.0)


def clamp_step(x: jnp.ndarray, max_trans: float = 0.1, max_rot: float = 0.1) -> jnp.ndarray:
    """Trust-region clamp on one GN step.

    The reference has no per-iteration safeguard (only the final 0.3 m guard,
    RGBDOdometry.cpp:464-467) because at 640x480 its coarsest level is 160x120
    and systems stay well-conditioned. At small working resolutions (or tiny
    per-object masks) a near-singular 6x6 can emit arbitrarily large steps;
    scaling the whole step preserves its direction and is a no-op for healthy
    solves, where per-iteration motion is far below these bounds.
    """
    tn = jnp.linalg.norm(x[0:3])
    rn = jnp.linalg.norm(x[3:6])
    scale = jnp.minimum(
        1.0,
        jnp.minimum(
            max_trans / jnp.maximum(tn, 1e-12), max_rot / jnp.maximum(rn, 1e-12)
        ),
    )
    return x * scale


def pack_bilinear_bank(
    maps: Sequence[jnp.ndarray], dtype=jnp.bfloat16
) -> jnp.ndarray:
    """Pre-shift the four bilinear taps of a set of maps into one wide array.

    TPU gathers cost ~2-3 ms per 300k indices regardless of how few channels
    they fetch, so sampling k maps bilinearly as separate ops costs 4k gathers
    per GN iteration (the dominant cost of the reference-shaped solver on
    TPU). Packing maps and their (+1,0),(0,+1),(+1,+1) shifts channel-wise —
    shifts are loop-invariant and hoisted — lets each iteration fetch ALL taps
    of ALL maps with ONE gather. Returns [H, W, 4*C].

    The bank is stored bf16 by default: gather time at 640x480 scales with
    bank bytes once the bank exceeds VMEM, and bf16 halves it. Rounding is
    zero-mean at ~0.2% relative; the GN normal equations average it over
    ~3e5 rows (blend math and rows stay f32). Pass dtype=jnp.float32 to
    disable (used by tests asserting tap exactness).
    """
    chans = [m if m.ndim == 3 else m[..., None] for m in maps]
    base = jnp.concatenate(chans, axis=-1)
    t01 = jnp.pad(base[:, 1:], ((0, 0), (0, 1), (0, 0)))
    t10 = jnp.pad(base[1:], ((0, 1), (0, 0), (0, 0)))
    t11 = jnp.pad(base[1:, 1:], ((0, 1), (0, 1), (0, 0)))
    return jnp.concatenate([base, t01, t10, t11], axis=-1).astype(dtype)


def bilinear_taps(bank: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, c: int):
    """One-gather bilinear tap fetch from a pack_bilinear_bank array.

    Returns (taps [4][H,W,c], wu, wv in [0,1), in_bounds)."""
    h, w = bank.shape[:2]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    inb = (u0i >= 0) & (v0i >= 0) & (u0i < w - 1) & (v0i < h - 1)
    u0c = jnp.clip(u0i, 0, w - 2)
    v0c = jnp.clip(v0i, 0, h - 2)
    g = bank[v0c, u0c].astype(jnp.float32)  # ONE gather: [H, W, 4c]
    taps = [g[..., i * c : (i + 1) * c] for i in range(4)]
    return taps, (u - u0), (v - v0), inb


def _interp_valid(taps, fu, fv, inb, sl: slice):
    """Bilinear blend of one channel-slice; valid iff all four taps nonzero."""
    t00, t01, t10, t11 = (t[..., sl] for t in taps)
    ok = (
        inb
        & jnp.any(t00 != 0, -1)
        & jnp.any(t01 != 0, -1)
        & jnp.any(t10 != 0, -1)
        & jnp.any(t11 != 0, -1)
    )
    fuc = fu[..., None]
    fvc = fv[..., None]
    val = (
        t00 * (1 - fuc) * (1 - fvc)
        + t01 * fuc * (1 - fvc)
        + t10 * (1 - fuc) * fvc
        + t11 * fuc * fvc
    )
    return jnp.where(ok[..., None], val, 0.0), ok


class PredSample(NamedTuple):
    """Bilinearly sampled prediction fields at the warp coordinates."""

    d_cp: jnp.ndarray | None  # [H,W,3] prediction vertex (prev cam frame)
    d_ok: jnp.ndarray | None
    n_cp: jnp.ndarray | None  # [H,W,3] prediction normal (unnormalised blend)
    n_ok: jnp.ndarray | None
    depth_last: jnp.ndarray | None  # [H,W] prediction depth (RGB term)
    depth_ok: jnp.ndarray | None
    img_last: jnp.ndarray | None  # [H,W] prediction intensity
    img_ok: jnp.ndarray | None


def build_generic_bank(d_cp_map, n_cp_map, depth_last, img_last,
                       dtype=jnp.float32, own_map=None) -> jnp.ndarray:
    """Full-channel sampling bank (coarse levels): the prediction vertex and
    normal maps enter verbatim. f32 by default — coarse banks are small.

    own_map (composite multi-model tracking): per-pixel owner of the
    prediction, stored as own+1 in the LAST channel so samplers can gate taps
    to the row's model (odometry/multi.py)."""
    maps = []
    if d_cp_map is not None:
        maps += [d_cp_map, n_cp_map]
    if depth_last is not None:
        maps += [depth_last, img_last]
    if own_map is not None:
        maps.append((own_map + 1).astype(jnp.float32))
    return pack_bilinear_bank(maps, dtype=dtype)


def _own_tap_ok(taps, own_ch: int, own_row):
    """All four bilinear taps owned by the row's model (own stored as own+1)."""
    want = (own_row + 1).astype(jnp.float32)
    ok = None
    for t in taps:
        eq = t[..., own_ch] == want
        ok = eq if ok is None else (ok & eq)
    return ok


def sample_generic(bank, uf, vf, use_icp: bool, use_rgb: bool,
                   own_gated: bool = False, own_row=None) -> PredSample:
    rgb_off = 6 if use_icp else 0
    c = rgb_off + (2 if use_rgb else 0) + (1 if own_gated else 0)
    taps, fu, fv, inb = bilinear_taps(bank, uf, vf, c)
    own_ok = _own_tap_ok(taps, c - 1, own_row) if own_gated else None
    d_cp = d_ok = n_cp = n_ok = dl = dl_ok = il = il_ok = None
    if use_icp:
        d_cp, d_ok = _interp_valid(taps, fu, fv, inb, slice(0, 3))
        n_cp, n_ok = _interp_valid(taps, fu, fv, inb, slice(3, 6))
        if own_gated:
            d_ok = d_ok & own_ok
            n_ok = n_ok & own_ok
    if use_rgb:
        d, dk = _interp_valid(taps, fu, fv, inb, slice(rgb_off, rgb_off + 1))
        im, ik = _interp_valid(
            taps, fu, fv, inb, slice(rgb_off + 1, rgb_off + 2)
        )
        dl, dl_ok, il, il_ok = d[..., 0], dk, im[..., 0], ik
        if own_gated:
            dl_ok = dl_ok & own_ok
            il_ok = il_ok & own_ok
    return PredSample(d_cp, d_ok, n_cp, n_ok, dl, dl_ok, il, il_ok)


def build_compact_bank(pred_depth, n_cp_map, img_last, own_map=None) -> jnp.ndarray:
    """Ray-reconstructed level-0 sampling bank (bf16, <= 7 channels x 4 taps).

    The level-0 prediction vertex map is EXACTLY ray * depth (splat_resolve
    emits vertex = (lx*z, ly*z, z); create_vmap likewise), so only the depth
    needs storing — positions are rebuilt per tap from the tap's pixel ray.
    Depth is split hi/lo into two bf16 channels (16 effective mantissa bits,
    ~1.5e-5 relative) so the ICP target keeps f32-grade precision while the
    gather moves half the bytes. Channels: [z_hi, z_lo, nx, ny, nz?, img?,
    own+1?] — the optional owner channel gates taps to the row's model in
    composite multi-model tracking (values <= 256, bf16-exact).
    """
    zhi = pred_depth.astype(jnp.bfloat16)
    zlo = (pred_depth - zhi.astype(jnp.float32)).astype(jnp.bfloat16)
    maps = [zhi.astype(jnp.float32), zlo.astype(jnp.float32)]
    if n_cp_map is not None:
        maps.append(n_cp_map)
    if img_last is not None:
        maps.append(img_last)
    if own_map is not None:
        maps.append((own_map + 1).astype(jnp.float32))
    return pack_bilinear_bank(maps, dtype=jnp.bfloat16)


def sample_compact(bank, uf, vf, cam: CameraModel, use_icp: bool,
                   use_rgb: bool, max_depth_rgb: float,
                   own_gated: bool = False, own_row=None) -> PredSample:
    c = 2 + (3 if use_icp else 0) + (1 if use_rgb else 0) + (
        1 if own_gated else 0
    )
    h, w = bank.shape[:2]
    taps, fu, fv, inb = bilinear_taps(bank, uf, vf, c)
    own_ok = _own_tap_ok(taps, c - 1, own_row) if own_gated else None
    u0 = jnp.clip(jnp.floor(uf), 0, w - 2)
    v0 = jnp.clip(jnp.floor(vf), 0, h - 2)
    fuc, fvc = fu[..., None], fv[..., None]
    wgt = [(1 - fuc) * (1 - fvc), fuc * (1 - fvc), (1 - fuc) * fvc, fuc * fvc]
    offs = [(0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0)]

    d_cp = jnp.zeros(uf.shape + (3,), jnp.float32)
    d_ok = inb
    dl = jnp.zeros(uf.shape, jnp.float32)
    dl_ok = inb
    for t, wg, (dy, dx) in zip(taps, wgt, offs):
        z = t[..., 0] + t[..., 1]  # hi + lo
        ok = t[..., 0] != 0
        d_ok = d_ok & ok
        lx = (u0 + dx - cam.cx) / cam.fx
        ly = (v0 + dy - cam.cy) / cam.fy
        d_cp = d_cp + wg * jnp.stack([lx * z, ly * z, z], axis=-1)
        if use_rgb:
            zr = jnp.where(z <= max_depth_rgb, z, 0.0)
            dl_ok = dl_ok & (zr > 0)
            dl = dl + wg[..., 0] * zr
    if own_gated:
        d_ok = d_ok & own_ok
        dl_ok = dl_ok & own_ok
    d_cp = jnp.where(d_ok[..., None], d_cp, 0.0)
    n_cp = n_ok = il = il_ok = None
    if use_icp:
        n_cp, n_ok = _interp_valid(taps, fu, fv, inb, slice(2, 5))
        if own_gated:
            n_ok = n_ok & own_ok
    if use_rgb:
        off = 2 + (3 if use_icp else 0)
        im, ik = _interp_valid(taps, fu, fv, inb, slice(off, off + 1))
        il, il_ok = im[..., 0], ik
        if own_gated:
            il_ok = il_ok & own_ok
    if not use_icp:
        d_cp = d_ok = None
    return PredSample(
        d_cp, d_ok, n_cp, n_ok,
        jnp.where(dl_ok, dl, 0.0) if use_rgb else None,
        dl_ok if use_rgb else None, il, il_ok,
    )


def icp_system(
    ps: PredSample,
    vcp: jnp.ndarray,  # [H,W,3] current vertices in the PREV camera frame
    nmap_curr: jnp.ndarray,
    Ri: jnp.ndarray,  # rotation of inv(result_Rt) (curr -> prev camera)
    v_valid: jnp.ndarray,  # [H,W] raw current-vertex validity (loop-invariant)
    dist_thresh: float,
    angle_thresh: float,
):
    """Point-to-plane ICP normal system at one pyramid level.

    Mirrors ICPReduction (reduce.cu:231-397), but works entirely in the prev
    camera frame (distances/angles are rigid-invariant, so the gates equal the
    reference's global-frame ones) and samples from a joint bilinear tap bank
    shared with the RGB term — the ICP association and the photometric warp
    project THE SAME transformed vertex, so both terms ride ONE gather per GN
    iteration. Returns ([7,7] system, count, [H,W] error image); block layout
    A = S[:6,:6], b = S[:6,6], sum r^2 = S[6,6].
    """
    z = vcp[..., 2]
    d_cp, vprev_ok = ps.d_cp, ps.d_ok
    n_cp, nprev_ok = ps.n_cp, ps.n_ok
    nprev_norm = jnp.linalg.norm(n_cp, axis=-1, keepdims=True)
    n_cp = n_cp / jnp.maximum(nprev_norm, 1e-12)
    in_bounds = vprev_ok & nprev_ok & (z > 0) & v_valid

    nc_cp = jnp.einsum("ij,hwj->hwi", Ri, nmap_curr,
                       precision=jax.lax.Precision.HIGHEST)
    dist = jnp.linalg.norm(d_cp - vcp, axis=-1)
    sine = jnp.linalg.norm(jnp.cross(nc_cp, n_cp), axis=-1)

    ncurr_valid = jnp.sum(nmap_curr * nmap_curr, axis=-1) > 0

    found = (
        in_bounds
        & (sine < angle_thresh)
        & (dist <= dist_thresh)
        & ncurr_valid
    )

    # rows built in the PREV camera frame (reduce.cu:320-329)
    r = jnp.sum(n_cp * (vcp - d_cp), axis=-1)
    rows = jnp.concatenate(
        [n_cp, jnp.cross(vcp, n_cp), r[..., None]], axis=-1
    )  # [H,W,7]
    rows = jnp.where(found[..., None], rows, 0.0).reshape(-1, 7)

    S = _system_from_rows(rows)
    count = jnp.sum(found)
    # error image semantics (reduce.cu:275-299): 0 outside bounds, dist inside
    err_img = jnp.where(in_bounds, jnp.where(jnp.isfinite(dist), dist, 0.0), 0.0)
    return S, count, err_img


def rgb_static_valid(
    level: LevelData, min_scale: float, mask_id, use_mask: bool
) -> jnp.ndarray:
    """Iteration-invariant part of the photometric validity (hoisted out of
    the GN loop): 4x4 neighbourhood support, gradient-magnitude gate, valid
    depth, borders (residualKernel, reduce.cu:770-800)."""
    h, w = level.img_next.shape
    xg = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
    yg = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))

    ok = level.img_next > 0
    if use_mask:
        ok = ok & (level.mask_next == mask_id)
    okf = ok.astype(jnp.float32)
    # window u in [i-2, i+2), v in [j-2, j+2) (reference bounds, :777-788);
    # at image borders the reference clamps the window, i.e. requires all
    # IN-BOUNDS taps valid — divide by the in-bounds tap count.
    def win_sum(x):
        # 4x4 box sum, window u in [i-2, i+2), v in [j-2, j+2): separable
        # shift-accumulate (a C=1 conv would go through a slow im2col on TPU)
        acc = jnp.zeros_like(x)
        for oy in (-2, -1, 0, 1):
            acc = acc + imops._shift2d(x, oy, 0)
        out = jnp.zeros_like(x)
        for ox in (-2, -1, 0, 1):
            out = out + imops._shift2d(acc, 0, ox)
        return out

    neigh = win_sum(okf)
    tap_count = win_sum(jnp.ones_like(okf))
    valid = neigh >= tap_count - 1e-3
    valid = valid & (xg < w - 5) & (yg < h - 1)
    m2 = level.didx**2 + level.didy**2
    valid = valid & (m2 >= min_scale)
    return valid & (level.depth_next > 0)


def rgb_correspondences(
    ps: PredSample,
    u0: jnp.ndarray,  # the shared warp coordinates (== ICP projection)
    v0: jnp.ndarray,
    td1: jnp.ndarray,  # transformed depth (z of the warped vertex)
    img_next: jnp.ndarray,
    static_valid: jnp.ndarray,  # rgb_static_valid(...)
    max_depth_delta: float,
    cam: CameraModel,
):
    """Photometric correspondence field (residualKernel, reduce.cu:759-839).

    Returns (valid [H,W], cp [H,W,3] last-camera-frame 3D points of the
    correspondence, diff [H,W], sigma_sum scalar, count scalar, error image).
    Deviates from the reference by warping with continuous coordinates and
    bilinear sampling — the reference's integer warp quantises the photometric
    residual to whole pixels, making sub-pixel motion invisible to the RGB
    term. The warp (u0, v0, td1) = K inv(result_Rt) K^-1 applied to the pixel
    grid at depth d1 equals the projection of the transformed current vertex,
    so it is shared with the ICP association (one gather serves both terms).
    """
    d0, d0_ok = ps.depth_last, ps.depth_ok
    img0, img0_ok = ps.img_last, ps.img_ok
    valid = (
        static_valid & d0_ok & img0_ok & (jnp.abs(td1 - d0) <= max_depth_delta)
    )

    # correspondence 3D point in the LAST camera frame, at the continuous warp
    # coordinate (replaces the reference's cloud_last[v0, u0] integer gather)
    cp = jnp.stack(
        [
            d0 * (u0 - cam.cx) / cam.fx,
            d0 * (v0 - cam.cy) / cam.fy,
            d0,
        ],
        axis=-1,
    )

    diff = jnp.where(valid, img_next - img0, 0.0)
    sigma = jnp.sum(diff * diff)
    count = jnp.sum(valid)
    err_img = jnp.where(valid, 0.001 * diff * diff, 0.0)
    return valid, cp, diff, sigma, count, err_img


def rgb_system(
    valid: jnp.ndarray,
    cp: jnp.ndarray,  # [H,W,3] correspondence points, last camera frame
    diff: jnp.ndarray,
    sigma_val: jnp.ndarray,
    didx: jnp.ndarray,
    didy: jnp.ndarray,
    cam: CameraModel,
    sobel_scale: float,
):
    """Photometric normal system (RGBReduction, reduce.cu:495-578)."""
    w_raw = sigma_val + jnp.abs(diff)
    w = jnp.where(w_raw > 1.19209290e-7, 1.0 / w_raw, 1.0)
    w = jnp.where(sigma_val == -1.0, 1.0, w)

    z = cp[..., 2]
    invz = jnp.where(z != 0, 1.0 / jnp.where(z != 0, z, 1.0), 0.0)
    dI_dx = w * sobel_scale * didx  # gradients at corresp.one == this pixel
    dI_dy = w * sobel_scale * didy
    v0c = dI_dx * cam.fx * invz
    v1c = dI_dy * cam.fy * invz
    v2c = -(v0c * cp[..., 0] + v1c * cp[..., 1]) * invz

    rows = jnp.stack(
        [
            v0c,
            v1c,
            v2c,
            -cp[..., 2] * v1c + cp[..., 1] * v2c,
            cp[..., 2] * v0c - cp[..., 0] * v2c,
            -cp[..., 1] * v0c + cp[..., 0] * v1c,
            -w * diff,
        ],
        axis=-1,
    )
    rows = jnp.where(valid[..., None], rows, 0.0).reshape(-1, 7)
    return _system_from_rows(rows)


def central_grads(img: jnp.ndarray):
    """(d/dx, d/dy) central differences, positive leftward/upward like the
    reference's inline SO3 gradient (reduce.cu:1010-1020)."""
    gx = (jnp.pad(img, ((0, 0), (1, 0)))[:, :-1] - jnp.pad(img, ((0, 0), (0, 1)))[:, 1:]) * 0.5
    gy = (jnp.pad(img, ((1, 0), (0, 0)))[:-1] - jnp.pad(img, ((0, 1), (0, 0)))[1:]) * 0.5
    return gx, gy


def so3_system(
    last_img: jnp.ndarray,
    so3_bank: jnp.ndarray,  # pack_bilinear_bank([next_img, ngx, ngy])
    last_grads,
    image_basis: jnp.ndarray,
    kinv: jnp.ndarray,
    krlr: jnp.ndarray,
):
    """Rotation-only photometric system (SO3Reduction, reduce.cu:947-1085).

    Returns ([4,4] system over [3 jac | residual], count).
    """
    h, w = last_img.shape
    xg = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
    yg = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))

    px = image_basis[0, 0] * xg + image_basis[0, 1] * yg + image_basis[0, 2]
    py = image_basis[1, 0] * xg + image_basis[1, 1] * yg + image_basis[1, 2]
    pz = image_basis[2, 0] * xg + image_basis[2, 1] * yg + image_basis[2, 2]
    safe_pz = jnp.where(pz != 0, pz, 1.0)
    # continuous warp + bilinear sampling, NOT the reference's __float2int_rn
    # (reduce.cu:1000-1001): integer warps make sub-pixel rotations invisible,
    # so the SO(3) loop re-adds the same delta every iteration and diverges
    wu = px / safe_pz
    wv = py / safe_pz

    found = (
        (wu >= 1)
        & (wu < w - 2)
        & (wv >= 1)
        & (wv < h - 2)
        & (xg >= 1)
        & (xg < w - 1)
        & (yg >= 1)
        & (yg < h - 1)
    )

    # ESM gradient: average of last-image gradient (at the pixel) and
    # next-image gradient (bilinear at the warped position); one gather
    taps, fu, fv, inb = bilinear_taps(so3_bank, wu, wv, 3)
    fuc, fvc = fu[..., None], fv[..., None]
    warped = (
        taps[0] * (1 - fuc) * (1 - fvc)
        + taps[1] * fuc * (1 - fvc)
        + taps[2] * (1 - fuc) * fvc
        + taps[3] * fuc * fvc
    )
    lgx, lgy = last_grads
    gx = (warped[..., 1] + lgx) * 0.5
    gy = (warped[..., 2] + lgy) * 0.5

    # point = K^-1 [x, y, 1]
    pt = jnp.stack(
        [
            kinv[0, 0] * xg + kinv[0, 1] * yg + kinv[0, 2],
            kinv[1, 0] * xg + kinv[1, 1] * yg + kinv[1, 2],
            kinv[2, 0] * xg + kinv[2, 1] * yg + kinv[2, 2],
        ],
        axis=-1,
    )
    z2 = pt[..., 2] ** 2
    a, b_, c = krlr[0, 0], krlr[0, 1], krlr[0, 2]
    d, e, f = krlr[1, 0], krlr[1, 1], krlr[1, 2]
    g, h_, i_ = krlr[2, 0], krlr[2, 1], krlr[2, 2]
    left = jnp.stack(
        [
            (pt[..., 2] * (d * gy + a * gx) - gy * g * yg - gx * g * xg) / z2,
            (pt[..., 2] * (e * gy + b_ * gx) - gy * h_ * yg - gx * h_ * xg) / z2,
            (pt[..., 2] * (f * gy + c * gx) - gy * i_ * yg - gx * i_ * xg) / z2,
        ],
        axis=-1,
    )
    jac = jnp.cross(left, pt)
    resid = -(warped[..., 0] - last_img)

    rows = jnp.concatenate([jac, resid[..., None]], axis=-1)
    rows = jnp.where(found[..., None], rows, 0.0).reshape(-1, 4)
    S = jax.lax.dot_general(
        rows, rows, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return S, jnp.sum(found)


def _K(cam: CameraModel) -> jnp.ndarray:
    return jnp.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]],
        jnp.float32,
    )


def _K_inv(cam: CameraModel) -> jnp.ndarray:
    return jnp.array(
        [
            [1.0 / cam.fx, 0.0, -cam.cx / cam.fx],
            [0.0, 1.0 / cam.fy, -cam.cy / cam.fy],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "cam", "seeded"))
def get_incremental_transformation(
    T_prev: jnp.ndarray,
    levels: Sequence[LevelData],
    last_next_img_l2: jnp.ndarray,
    cfg: OdometryConfig,
    cam: CameraModel,
    mask_id: jnp.ndarray | int = 0,
    T_init: jnp.ndarray | None = None,
    seeded: bool = False,
    seed_valid: jnp.ndarray | None = None,
) -> OdometryResult:
    """Full multi-level GN odometry solve as one XLA program.

    T_prev: previous pose (model/camera -> global). levels: per-level inputs,
    index 0 = finest. last_next_img_l2: previous frame's level-2 intensity for
    SO(3) pre-alignment (reference swaps lastNextImage each frame).
    Mirrors RGBDOdometry::getIncrementalTransformation (RGBDOdometry.cpp:217-477).
    """
    use_icp = (not cfg.rgb_only) and cfg.icp_weight > 0
    use_rgb = cfg.rgb_only or cfg.icp_weight < 100

    f32 = jnp.float32
    T_prev = T_prev.astype(f32)

    # T_prev is the pose the "last" (prediction) images were rendered at — the
    # RGB warp is built relative to it. An external pose seed (keypoint/tf
    # init, Tnew in MultiMotionFusion.cpp:320-353) therefore enters as the
    # INITIAL INCREMENT, not as T_prev; the reference instead re-renders the
    # prediction at the seed pose (an extra predict+fuse+clean warm-up,
    # :355-372) to keep T_prev == render pose. Seeding supersedes the SO(3)
    # pre-alignment (both estimate the same inter-frame rotation).
    so3_err = jnp.array(0.0, f32)
    so3_count = jnp.array(0.0, f32)
    resultR = jnp.eye(3, dtype=f32)
    if cfg.so3_prealign and cfg.so3_iterations > 0:
        lvl = cfg.num_pyr - 1
        cam_l = cam.level(lvl)
        K = _K(cam_l)
        Kinv = _K_inv(cam_l)
        big = jnp.array(3.4e38 / 2, f32)
        # loop-invariant sampling bank: next image + its gradients, pre-shifted
        ngx, ngy = central_grads(levels[lvl].img_next)
        so3_bank = pack_bilinear_bank([levels[lvl].img_next, ngx, ngy])
        last_grads = central_grads(last_next_img_l2)

        def so3_cond(carry):
            return (carry[0] < cfg.so3_iterations) & ~carry[5]

        def so3_body(carry):
            j, R, last_err, last_count, last_R, done, fin_err, fin_count = carry
            basis = K @ R @ Kinv
            krlr = K @ R
            S, cnt = so3_system(last_next_img_l2, so3_bank, last_grads, basis, Kinv, krlr)
            cntf = cnt.astype(f32)
            err = jnp.sqrt(S[3, 3]) / jnp.maximum(cntf, 1.0)

            # DEVIATION (PARITY #25): the reference's convergence test
            # (RGBDOdometry.cpp:285) compares |lastError - lastSO3Count| —
            # error against COUNT — which is never < 0.001 in practice, so
            # its SO(3) loop only ever stops on divergence or the iteration
            # cap (all 10 every frame). The evident intent is count
            # stability; testing it stops after ~3-4 iterations at the same
            # rotation (the GN refinement consumes the result either way)
            converged = (err < last_err) & (jnp.abs(last_count - cntf) < 0.5)
            diverging = err > last_err + 0.001

            delta = solve_preconditioned(S[:3, :3], S[:3, 3])
            dn = jnp.linalg.norm(delta)
            delta = delta * jnp.minimum(1.0, 0.1 / jnp.maximum(dn, 1e-12))
            delta = jnp.where(cnt >= 60, delta, jnp.zeros_like(delta))
            R_new = se3.so3_exp(delta) @ R

            # converged: keep R (break before update); diverging: revert to last_R
            R_out = jnp.where(done | converged, R, jnp.where(diverging, last_R, R_new))
            fin_err_out = jnp.where(done, fin_err, jnp.where(diverging, last_err, err))
            fin_count_out = jnp.where(
                done, fin_count, jnp.where(diverging, last_count, cntf)
            )
            return (
                j + 1,
                R_out,
                jnp.where(done, last_err, err),
                jnp.where(done, last_count, cntf),
                jnp.where(done, last_R, R),
                done | converged | diverging,
                fin_err_out,
                fin_count_out,
            )

        init = (jnp.array(0, jnp.int32), resultR, big, big,
                jnp.eye(3, dtype=f32), jnp.array(False), so3_err, so3_count)
        # while_loop (not fori): the done flag must SKIP the remaining
        # iterations' gathers, not just mask their results
        out = jax.lax.while_loop(so3_cond, so3_body, init)
        _, resultR, _, _, _, _, so3_err, so3_count = out

    so3_Rt = jnp.eye(4, dtype=f32).at[:3, :3].set(resultR)
    if seeded and T_init is not None:
        # estimate = T_prev @ inv(result_Rt) == T_init at iteration 0.
        # seed_valid selects per frame between the external seed and the
        # SO(3) pre-alignment (which now ALWAYS runs): with weak descriptors
        # a rejected keypoint seed must not silently also discard SO(3) —
        # that combination is what let bad frames slip through before.
        seed_Rt = se3.inverse_T(T_init.astype(f32)) @ T_prev
        sv = jnp.asarray(True) if seed_valid is None else seed_valid
        result_Rt = jnp.where(sv, seed_Rt, so3_Rt)
    else:
        result_Rt = so3_Rt

    # ---- coarse-to-fine joint GN ---------------------------------------
    schedule = cfg.schedule()
    R_prev_inv_T = se3.inverse_T(T_prev)

    icp_err = jnp.array(0.0, f32)
    icp_count = jnp.array(0.0, f32)
    rgb_err = jnp.array(0.0, f32)
    rgb_count = jnp.array(0.0, f32)
    lastA = jnp.zeros((6, 6), f32)
    lastb = jnp.zeros((6,), f32)

    fine_ctx = {}  # level-0 inputs kept for the optional error-image pass

    def eval_systems(result_Rt, sampler, px, cam_l, last_rgb_err, scale2,
                     want_err: bool):
        """One evaluation of the ICP+RGB normal systems at pose result_Rt.

        px holds the per-pixel fields (possibly a strided view of the level);
        scale2 rescales sums to full-grid units so the ICP/RGB fusion balance,
        reported counts and covariance are invariant to fine_subsample.
        """
        vmap_curr, nmap_curr, img_next, didx, didy, static_valid, v_valid = px
        Rt_inv = se3.inverse_T(result_Rt)
        Ri, ti = Rt_inv[:3, :3], Rt_inv[:3, 3]
        vcp = jnp.einsum("ij,hwj->hwi", Ri, vmap_curr,
                         precision=jax.lax.Precision.HIGHEST) + ti
        z = vcp[..., 2]
        safe_z = jnp.where(z != 0, z, 1.0)
        # sub-pixel projective warp: bilinear (validity-gated) instead of
        # the reference's __float2int_rn nearest-pixel gathers — integer
        # warps quantise sub-pixel motion away (see module docstring)
        uf = vcp[..., 0] * cam_l.fx / safe_z + cam_l.cx
        vf = vcp[..., 1] * cam_l.fy / safe_z + cam_l.cy
        ps = sampler(uf, vf)

        rgb_size = jnp.array(0.0, f32)
        S_rgb = jnp.zeros((7, 7), f32)
        rgb_img = None
        diverging = jnp.array(False)
        if use_rgb:
            valid, cp, diff, sigma, cnt, err_img = rgb_correspondences(
                ps, uf, vf, z, img_next, static_valid,
                cfg.max_depth_delta_rgb, cam_l,
            )
            rgb_size = cnt.astype(f32) * scale2
            sigma = sigma * scale2
            if want_err:
                rgb_img = err_img
            tmp_err = jnp.sqrt(sigma) / jnp.maximum(rgb_size, 1.0)
            sigma_val = jnp.where(tmp_err == 0, 1.0, rgb_size)
            if cfg.rgb_only:
                sigma_val = jnp.full_like(sigma_val, -1.0)
                diverging = tmp_err > last_rgb_err
            S_rgb = scale2 * rgb_system(
                valid, cp, diff, sigma_val, didx, didy, cam_l, cfg.sobel_scale,
            )
        else:
            tmp_err = jnp.array(0.0, f32)

        S_icp = jnp.zeros((7, 7), f32)
        icp_cnt = jnp.array(0.0, f32)
        icp_img = None
        if use_icp:
            S_icp, icp_cnt_raw, err_img_icp = icp_system(
                ps, vcp, nmap_curr, Ri, v_valid,
                cfg.dist_thresh, cfg.angle_thresh,
            )
            S_icp = scale2 * S_icp
            icp_cnt = icp_cnt_raw.astype(f32) * scale2
            if want_err:
                icp_img = err_img_icp
        return S_icp, icp_cnt, icp_img, S_rgb, rgb_size, tmp_err, diverging, rgb_img

    for i in range(cfg.num_pyr - 1, -1, -1):
        iters = schedule[i]
        if iters == 0:
            continue
        cam_l = cam.level(i)
        level = levels[i]
        # minScale = (minGradMag^2) / sobelScale^2 (RGBDOdometry.cpp:365)
        min_scale = (cfg.min_grad_magnitudes[i] ** 2) / (cfg.sobel_scale**2)
        # Loop-invariant sampling bank, hoisted so each GN iteration costs ONE
        # gather TOTAL: the ICP association and the RGB warp sample the same
        # projected coordinate, so the prediction's vertex/normal maps (kept
        # in the prediction camera frame — loop-invariant) and depth/intensity
        # share a joint pre-shifted tap bank. With ICP on, every level uses
        # the compact ray-reconstructed bf16 bank (build_compact_bank) — the
        # full-channel f32 bank exceeds VMEM at 640x480 and its gather is the
        # hottest op of the whole frame; build_level_data keeps all levels
        # ray-aligned. The generic full-channel bank remains for rgb_only.
        # Bank choice is EMPIRICAL (TPU v5e traces): at the 640x480 level the
        # compact bf16 bank gathers 26x faster than the full-channel f32 bank
        # (14.7 MB vs 39 MB working set), but at coarse levels the bf16
        # gather is ~6x SLOWER than f32 from the same small bank — sub-word
        # gathers only pay off once the bank outgrows on-chip memory. All
        # levels are ray-aligned (build_level_data), so either form is valid.
        compact = use_icp and i == 0
        if compact:
            pred_depth = level.vmap_prev[..., 2]
            joint_bank = build_compact_bank(
                pred_depth, level.nmap_prev,
                level.img_last if use_rgb else None,
            )
            sampler = functools.partial(
                sample_compact, joint_bank, cam=cam_l, use_icp=use_icp,
                use_rgb=use_rgb, max_depth_rgb=cfg.max_depth_rgb,
            )
        else:
            joint_bank = build_generic_bank(
                level.vmap_prev if use_icp else None,
                level.nmap_prev if use_icp else None,
                level.depth_last if use_rgb else None,
                level.img_last if use_rgb else None,
            )
            sampler = functools.partial(
                sample_generic, joint_bank, use_icp=use_icp, use_rgb=use_rgb,
            )
        v_valid = level.vmap_curr[..., 2] > 0
        static_valid = (
            rgb_static_valid(level, min_scale, mask_id, cfg.mask_rgb)
            if use_rgb
            else None
        )
        px_full = (
            level.vmap_curr, level.nmap_curr, level.img_next,
            level.didx, level.didy, static_valid, v_valid,
        )
        # GN iterations at the finest level evaluate on a strided pixel grid
        # (see OdometryConfig.fine_subsample / mid_subsample); the warp/bank
        # stay full-res
        # mid_subsample only engages at production-scale level-1 images (see
        # odometry/multi.py — too sparse at test-scale cameras, saving nil)
        sub = (cfg.fine_subsample if i == 0
               else cfg.mid_subsample
               if i == 1 and cam_l.width * cam_l.height >= 65536 else 1)
        if sub == 2:
            # one fused stride-2 extraction for ALL per-pixel fields (a bare
            # [::2, ::2] slice per field lowers to a lane-stride gather each,
            # see imops.decimate2)
            vm, nm, im_n, dx_, dy_, sv_, vv_ = px_full
            chans = [im_n[None], dx_[None], dy_[None],
                     vv_.astype(jnp.float32)[None]]
            if sv_ is not None:
                chans.append(sv_.astype(jnp.float32)[None])
            chans += [jnp.moveaxis(vm, -1, 0), jnp.moveaxis(nm, -1, 0)]
            dec = imops.decimate2(jnp.concatenate(chans, axis=0))
            k = 5 if sv_ is not None else 4
            px = (
                jnp.moveaxis(dec[k : k + 3], 0, -1),
                jnp.moveaxis(dec[k + 3 : k + 6], 0, -1),
                dec[0], dec[1], dec[2],
                (dec[4] > 0.5) if sv_ is not None else None,
                dec[3] > 0.5,
            )
            scale2 = jnp.float32(4.0)
        elif sub > 1:
            px = tuple(
                None if a is None else a[::sub, ::sub] for a in px_full
            )
            scale2 = jnp.float32(sub * sub)
        else:
            px = px_full
            scale2 = jnp.float32(1.0)
        if i == 0:
            fine_ctx = dict(sampler=sampler, px_full=px_full, cam_l=cam_l)

        if i == cfg.num_pyr - 1 and seeded and T_init is not None:
            # seed arbitration (no reference analogue — it trusts SuperPoint
            # seeds unconditionally, MultiMotionFusion.cpp:320-353): evaluate
            # the dense residual at the seed pose AND the SO(3) pose on the
            # coarse grid and keep the better. A wrong-but-consistent
            # keypoint consensus (descriptor aliasing on repetitive texture)
            # passes every sparse gate, but it cannot beat the dense
            # evidence; a CORRECT seed wins the comparison, so strong
            # detectors lose nothing.
            def _arb_err(Rt):
                S_i, cnt_i, _, S_r, cnt_r, terr, _, _ = eval_systems(
                    Rt, sampler, px, cam_l, jnp.array(3.4e38, f32), scale2,
                    False,
                )
                if use_icp:
                    e = jnp.sqrt(S_i[6, 6]) / jnp.maximum(cnt_i, 1.0)
                    return jnp.where(cnt_i >= 60, e, jnp.inf)
                return jnp.where(cnt_r >= 60, terr, jnp.inf)

            e_cur = _arb_err(result_Rt)
            e_so3 = _arb_err(so3_Rt)
            result_Rt = jnp.where(e_cur <= e_so3, result_Rt, so3_Rt)

        def level_cond(carry, iters=iters):
            return (carry[0] < iters) & ~carry[9]

        def level_body(carry, cam_l=cam_l, sampler=sampler, px=px,
                       scale2=scale2):
            (j, result_Rt, icp_err, icp_count, rgb_err, rgb_count, lastA,
             lastb, last_rgb_err, stopped) = carry

            (S_icp, icp_cnt, _, S_rgb, rgb_size, tmp_err, diverging, _
             ) = eval_systems(
                result_Rt, sampler, px, cam_l, last_rgb_err, scale2, False
            )

            A_icp, b_icp = S_icp[:6, :6], S_icp[:6, 6]
            A_rgbd, b_rgbd = S_rgb[:6, :6], S_rgb[:6, 6]
            if use_icp and use_rgb:
                # Consistent least-squares fusion: ICP rows weighted by w give
                # A = A_rgbd + w^2 A_icp AND b = b_rgbd + w^2 b_icp. This
                # deviates from the reference (RGBDOdometry.cpp:433-434),
                # which pairs w^2 in A with only w in b — dimensionally
                # inconsistent, so in ICP-dominated directions each GN step
                # realises only 1/w of the Newton step (measured: the solver
                # contracts at exactly 1 - 1/w = 0.9 per iteration and leaves
                # a geometric tail of un-applied motion when the iteration
                # budget runs out). Consistent weights restore quadratic
                # convergence, which the early-exit below then harvests.
                w = cfg.icp_weight
                A = A_rgbd + w * w * A_icp
                b = b_rgbd + w * w * b_icp
            elif use_icp:
                A, b = A_icp, b_icp
            else:
                A, b = A_rgbd, b_rgbd

            x = clamp_step(solve_preconditioned(A, b))
            Rt_new = se3.gn_update_pose(result_Rt, x)

            # degenerate-system gate: with almost no correspondences the
            # normal equations are noise; hold the pose instead
            enough = (icp_cnt + rgb_size) >= 60
            upd = ~diverging & enough
            result_Rt = jnp.where(upd, Rt_new, result_Rt)
            # convergence early-exit (pure performance, no reference analogue:
            # the reference always burns its full {10,5,4} budget): once the
            # applied step is sub-micrometre / sub-microradian the remaining
            # iterations are numerically idempotent, and they dominate the
            # frame budget at level 0 (one 307200-index gather each)
            eps = cfg.convergence_eps
            converged = (
                upd
                & (jnp.linalg.norm(x[0:3]) < eps)
                & (jnp.linalg.norm(x[3:6]) < eps)
            )
            icp_err_new = jnp.sqrt(S_icp[6, 6]) / jnp.maximum(icp_cnt, 1.0)
            stopped = stopped | diverging | ~enough | converged
            return (
                j + 1,
                result_Rt,
                jnp.where(upd & use_icp, icp_err_new, icp_err),
                jnp.where(upd & use_icp, icp_cnt, icp_count),
                jnp.where(upd, tmp_err, rgb_err),
                jnp.where(upd, rgb_size, rgb_count),
                jnp.where(upd, A, lastA),
                jnp.where(upd, b, lastb),
                jnp.where(upd, tmp_err, last_rgb_err),
                stopped,
            )

        carry = (
            jnp.array(0, jnp.int32),
            result_Rt, icp_err, icp_count, rgb_err, rgb_count, lastA, lastb,
            jnp.array(3.4e38, f32), jnp.array(False),
        )
        carry = jax.lax.while_loop(level_cond, level_body, carry)
        (_, result_Rt, icp_err, icp_count, rgb_err, rgb_count, lastA, lastb,
         _, _) = carry

    # ---- optional per-pixel error images (legacy CRF input) ---------------
    # one full-resolution evaluation at the FINAL pose; the reference takes
    # these from the last iteration's textures (equivalent modulo one step)
    icp_err_img = jnp.zeros(levels[0].img_next.shape, f32)
    rgb_err_img = jnp.zeros(levels[0].img_next.shape, f32)
    if cfg.error_images and fine_ctx:
        _, _, icp_img, _, _, _, _, rgb_img = eval_systems(
            result_Rt, fine_ctx["sampler"], fine_ctx["px_full"],
            fine_ctx["cam_l"], jnp.array(3.4e38, f32), jnp.float32(1.0), True,
        )
        if icp_img is not None:
            icp_err_img = icp_img
        if rgb_img is not None:
            rgb_err_img = rgb_img

    T_new = T_prev @ se3.inverse_T(result_Rt)

    # RGB divergence guard (RGBDOdometry.cpp:464-467)
    if use_rgb:
        diverged = jnp.linalg.norm(T_new[:3, 3] - T_prev[:3, 3]) > cfg.divergence_trans_norm
        T_new = jnp.where(diverged, T_prev, T_new)

    return OdometryResult(
        pose=T_new,
        icp_error=icp_err,
        icp_count=icp_count,
        rgb_error=rgb_err,
        rgb_count=rgb_count,
        so3_error=so3_err,
        so3_count=so3_count,
        A=lastA,
        b=lastb,
        icp_error_image=icp_err_img,
        rgb_error_image=rgb_err_img,
    )
