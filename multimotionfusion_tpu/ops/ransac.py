"""Rigid (SE3) fitting: weighted Kabsch and batched RANSAC.

TPU re-design of reference Core/Utils/RigidRANSAC.{h,cpp}:
- `fit` (RigidRANSAC.cpp:70-116) -> `kabsch_fit` (masked/weighted, batchable);
- `estimate` (:124-180) -> `ransac_fit`: instead of a sequential loop over
  random shuffles, ALL candidate minimal sets are drawn at once (Gumbel top-k
  over the validity mask gives 3 distinct valid indices per candidate) and
  evaluated with one vmapped Kabsch + one [C, N] distance matrix; the winner is
  selected with a masked argmin. Deterministic given the PRNG key (the
  reference seeds std::default_random_engine implicitly).

Semantics kept from the reference:
- model maps p1 -> p0 (T such that p0 ~ T @ p1);
- acceptance gate: #inliers > max(round(inlier_fraction * N), 3);
- winner: minimum mean inlier distance after refitting on all inliers;
- fallback: least-squares fit over all (masked) points with error = +inf.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.config import RansacConfig
from multimotionfusion_tpu.utils import se3


class RansacResult(NamedTuple):
    transform: jnp.ndarray  # [4, 4]
    error: jnp.ndarray  # scalar, mean inlier distance (inf if no model passed)
    inliers: jnp.ndarray  # [N] bool
    num_inliers: jnp.ndarray  # scalar int32
    ok: jnp.ndarray  # scalar bool: some candidate passed the gate


def _horn_rotation(A: jnp.ndarray) -> jnp.ndarray:
    """Optimal rotation maximising tr(R A^T) for A = sum_i q0_i q1_i^T.

    Horn's closed-form quaternion solution (Horn 1987): the optimal q is the
    largest-eigenvalue eigenvector of the symmetric 4x4 N matrix built from
    S = A^T. The SVD route (Kabsch) lowers to a LAPACK-style custom-call on
    TPU (measured ~0.2 ms per batched invocation, several per frame in the
    RANSAC seeds); a shifted power iteration on N is pure VPU arithmetic,
    batches over leading dims for free, and always returns a PROPER rotation
    (no reflection correction needed). Degenerate inputs (rank-deficient A:
    collinear or duplicated minimal sets) yield *some* valid rotation whose
    residuals are large — exactly how a degenerate RANSAC candidate should
    lose. 40 iterations drive healthy fits to float32 machine precision.
    """
    S = A.T
    sxx, sxy, sxz = S[0, 0], S[0, 1], S[0, 2]
    syx, syy, syz = S[1, 0], S[1, 1], S[1, 2]
    szx, szy, szz = S[2, 0], S[2, 1], S[2, 2]
    N = jnp.stack(
        [
            jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx]),
            jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz]),
            jnp.stack([szx - sxz, sxy + syx, syy - sxx - szz, syz + szy]),
            jnp.stack([sxy - syx, szx + sxz, syz + szy, szz - sxx - syy]),
        ]
    )
    # shift so the largest ALGEBRAIC eigenvalue dominates in magnitude
    # (lambda_min >= -||N||_F, so N + ||N||_F I is PSD)
    c = jnp.sqrt(jnp.sum(N * N)) + 1e-12
    Ns = N + c * jnp.eye(4, dtype=A.dtype)
    v = jnp.array([1.0, 0.17, 0.23, 0.31], A.dtype)
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        v = Ns @ v
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-20)

    q = jax.lax.fori_loop(0, 40, body, v)
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    return jnp.stack(
        [
            jnp.stack(
                [
                    1 - 2 * (qy * qy + qz * qz),
                    2 * (qx * qy - qw * qz),
                    2 * (qx * qz + qw * qy),
                ]
            ),
            jnp.stack(
                [
                    2 * (qx * qy + qw * qz),
                    1 - 2 * (qx * qx + qz * qz),
                    2 * (qy * qz - qw * qx),
                ]
            ),
            jnp.stack(
                [
                    2 * (qx * qz - qw * qy),
                    2 * (qy * qz + qw * qx),
                    1 - 2 * (qx * qx + qy * qy),
                ]
            ),
        ]
    )


def kabsch_fit(p0: jnp.ndarray, p1: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted rigid fit: returns T (4x4) minimising sum_i w_i ||T @ p1_i - p0_i||^2.

    Weighted generalisation of RigidRANSAC.cpp fit(); weights may be a boolean
    mask or non-negative floats. Degenerate inputs (all-zero weights) return
    identity. Rotation via Horn's quaternion method (see _horn_rotation) —
    same optimum as the reference's SVD route, TPU-native arithmetic.
    """
    w = weights.astype(p0.dtype)
    wsum = jnp.sum(w)
    safe = jnp.maximum(wsum, 1e-12)
    p0m = jnp.sum(p0 * w[:, None], axis=0) / safe
    p1m = jnp.sum(p1 * w[:, None], axis=0) / safe
    q0 = (p0 - p0m) * w[:, None]
    q1 = p1 - p1m
    # cross-covariance (reference: A = ((p1-p1m)^T (p0-p0m))^T = (p0-p0m)^T (p1-p0m))
    A = jnp.matmul(q0.T, q1, precision=jax.lax.Precision.HIGHEST)  # [3,3]
    R = _horn_rotation(A)
    t = p0m - R @ p1m
    T = se3.make_T(R, t)
    return jnp.where(wsum >= 3.0 - 1e-6, T, jnp.eye(4, dtype=p0.dtype))


def residual_norms(T: jnp.ndarray, p0: jnp.ndarray, p1: jnp.ndarray) -> jnp.ndarray:
    """||p0_i - T @ p1_i|| per correspondence (RigidRANSAC.cpp apply())."""
    p1t = jnp.matmul(p1, T[:3, :3].T,
                     precision=jax.lax.Precision.HIGHEST) + T[:3, 3]
    return jnp.linalg.norm(p0 - p1t, axis=-1)


def _sample_minimal_sets(key, valid: jnp.ndarray, num_candidates: int) -> jnp.ndarray:
    """[C, 3] valid indices per candidate via inverse-CDF sampling.

    Draws three DISTINCT uniform ranks in [1, n_valid] (sequential shifted
    sampling — the second rank is drawn from n-1 values and shifted past the
    first, etc., which is exact sampling without replacement) and maps each
    to the rank-th valid index with a binary search over the running valid
    count — O(C log N) instead of the Gumbel-top-k route whose lax.top_k
    lowers to a FULL [C, N] sort on TPU (measured ~2 ms at C=200, N=4096,
    batched over 5 slots). With fewer than 3 valid points the ranks clamp
    and repeat; the degenerate minimal set fits a junk rotation and fails
    the inlier gate, like the reference's N >= Nparams assertion.
    """
    n = valid.shape[0]
    cnt = jnp.cumsum(valid.astype(jnp.int32))
    total = cnt[-1].astype(jnp.float32)
    u = jax.random.uniform(key, (num_candidates, 3))
    r0 = jnp.floor(u[:, 0] * jnp.maximum(total, 1.0)).astype(jnp.int32) + 1
    r1 = jnp.floor(u[:, 1] * jnp.maximum(total - 1.0, 1.0)).astype(jnp.int32) + 1
    r1 = r1 + (r1 >= r0).astype(jnp.int32)
    r2 = jnp.floor(u[:, 2] * jnp.maximum(total - 2.0, 1.0)).astype(jnp.int32) + 1
    lo = jnp.minimum(r0, r1)
    hi = jnp.maximum(r0, r1)
    r2 = r2 + (r2 >= lo).astype(jnp.int32)
    r2 = r2 + (r2 >= hi).astype(jnp.int32)
    r = jnp.stack([r0, r1, r2], axis=-1)
    r = jnp.clip(r, 1, jnp.maximum(total.astype(jnp.int32), 1))
    idx = jnp.searchsorted(cnt, r, side="left")
    return jnp.clip(idx, 0, n - 1)


def ransac_fit(
    key: jax.Array,
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: RansacConfig,
) -> RansacResult:
    """Batched RANSAC rigid fit over fixed-capacity correspondences.

    p0, p1: [N, 3] (padded rows arbitrary), valid: [N] bool. All `cfg.iterations`
    candidates are evaluated in parallel; heavy parts are two batched 3x3 SVDs
    and one [C, N] distance evaluation, which XLA maps onto the VPU/MXU cleanly.
    """
    n_valid = jnp.sum(valid.astype(jnp.int32))
    idx = _sample_minimal_sets(key, valid, cfg.iterations)  # [C, 3]

    def fit_minimal(ix):
        sel0 = p0[ix]
        sel1 = p1[ix]
        return kabsch_fit(sel0, sel1, jnp.ones((3,), p0.dtype))

    T_cand = jax.vmap(fit_minimal)(idx)  # [C, 4, 4]

    # distances of every point under every candidate: [C, N]
    p1t = jnp.einsum("cij,nj->cni", T_cand[:, :3, :3], p1,
                     precision=jax.lax.Precision.HIGHEST) + T_cand[:, None, :3, 3]
    dist = jnp.linalg.norm(p0[None] - p1t, axis=-1)
    inl = (dist < cfg.inlier_threshold) & valid[None, :]  # [C, N]
    n_inl = jnp.sum(inl.astype(jnp.int32), axis=1)  # [C]

    gate = jnp.maximum(
        jnp.rint(cfg.inlier_fraction * n_valid.astype(jnp.float32)).astype(jnp.int32), 3
    )
    passed = n_inl > gate

    # refit every candidate on its inliers (cheap: batched 3x3 SVD again)
    T_refit = jax.vmap(kabsch_fit, in_axes=(None, None, 0))(p0, p1, inl)
    p1t2 = jnp.einsum("cij,nj->cni", T_refit[:, :3, :3], p1,
                      precision=jax.lax.Precision.HIGHEST) + T_refit[:, None, :3, 3]
    dist2 = jnp.linalg.norm(p0[None] - p1t2, axis=-1)
    mean_err = jnp.sum(jnp.where(inl, dist2, 0.0), axis=1) / jnp.maximum(
        n_inl.astype(p0.dtype), 1.0
    )

    score = jnp.where(passed, mean_err, jnp.inf)
    best = jnp.argmin(score)
    any_passed = jnp.any(passed)

    # fallback: least-squares over all valid points, error = inf (reference :141-142)
    T_fallback = kabsch_fit(p0, p1, valid)

    T_best = jnp.where(any_passed, T_refit[best], T_fallback)
    return RansacResult(
        transform=T_best,
        error=jnp.where(any_passed, score[best], jnp.inf),
        inliers=jnp.where(any_passed, inl[best], jnp.zeros_like(valid)),
        num_inliers=jnp.where(any_passed, n_inl[best], 0),
        ok=any_passed,
    )
