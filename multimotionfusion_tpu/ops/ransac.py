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


def kabsch_fit(p0: jnp.ndarray, p1: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted rigid fit: returns T (4x4) minimising sum_i w_i ||T @ p1_i - p0_i||^2.

    Weighted generalisation of RigidRANSAC.cpp fit(); weights may be a boolean
    mask or non-negative floats. Degenerate inputs (all-zero weights) return
    identity.
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
    U, _, Vt = jnp.linalg.svd(A)
    d = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=p0.dtype)).at[2, 2].set(d)
    R = U @ S @ Vt
    t = p0m - R @ p1m
    T = se3.make_T(R, t)
    return jnp.where(wsum >= 3.0 - 1e-6, T, jnp.eye(4, dtype=p0.dtype))


def residual_norms(T: jnp.ndarray, p0: jnp.ndarray, p1: jnp.ndarray) -> jnp.ndarray:
    """||p0_i - T @ p1_i|| per correspondence (RigidRANSAC.cpp apply())."""
    p1t = jnp.matmul(p1, T[:3, :3].T,
                     precision=jax.lax.Precision.HIGHEST) + T[:3, 3]
    return jnp.linalg.norm(p0 - p1t, axis=-1)


def _sample_minimal_sets(key, valid: jnp.ndarray, num_candidates: int) -> jnp.ndarray:
    """[C, 3] distinct valid indices per candidate via Gumbel top-k."""
    n = valid.shape[0]
    logit = jnp.where(valid, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (num_candidates, n))
    _, idx = jax.lax.top_k(logit[None, :] + g, 3)
    return idx


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
