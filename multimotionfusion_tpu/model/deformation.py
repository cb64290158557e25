"""Embedded deformation graph for map correction after loop closures.

TPU re-design of reference Core/Utils/DeformationGraph.{h,cpp} (Sumner-style
embedded deformation) + Core/Model/Deformation.{h,cpp}:

- nodes are sampled from the surfel map in storage order (which is roughly
  temporal, like the reference's sample.vert transform-feedback subsample);
- each node carries an affine transform (A in R^3x3 initialised to identity
  + translation t); energy = wRot * orthogonality(A) + wReg * neighbour
  consistency + wCon * point constraints (DeformationGraph.cpp:25-27 weights
  wRot=1, wReg=10, wCon=100);
- Gauss-Newton with jacfwd-built residuals and ONE dense on-device solve —
  the reference hand-builds a sparse Jacobian and calls CHOLMOD on the host
  (CholeskyDecomp.*); at <=256 nodes the dense [12N x 12N] normal system is a
  single MXU-friendly Cholesky, no sparse machinery needed;
- application to surfels searches node candidates by INIT time (the
  reference's binary search + lookBack window in copy_unstable.vert:140+),
  then blends the k=4 nearest with (1 - d/dmax)^2 weights.

The reference fork never activates this path (its acceptance branches hold
assert(0), MultiMotionFusion.cpp:703,775 — SURVEY.md §5.4); the mechanism is
implemented and tested here, and stays off by default for parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimotionfusion_tpu.config import DeformationConfig
from multimotionfusion_tpu.model import surfel_map as sm


class DeformationGraph(NamedTuple):
    positions: jnp.ndarray  # [N, 3] node positions g_k
    times: jnp.ndarray  # [N] float32 node init timestamps (sorted)
    A: jnp.ndarray  # [N, 3, 3] per-node affine (identity at rest)
    t: jnp.ndarray  # [N, 3] per-node translation
    valid: jnp.ndarray  # [N] bool

    @property
    def num_nodes(self) -> int:
        return self.positions.shape[0]


def sample_nodes(smap: sm.SurfelMap, max_nodes: int) -> DeformationGraph:
    """Systematic subsample of the live surfels, ordered by storage (~time)."""
    cap = smap.capacity
    alive = smap.alive_mask()
    n_alive = jnp.maximum(jnp.sum(alive.astype(jnp.int32)), 1)
    # rank of each live surfel; pick ranks closest to the stride grid
    rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
    stride = jnp.maximum(n_alive // max_nodes, 1)
    take = alive & (jnp.mod(rank, stride) == 0) & (rank // stride < max_nodes)
    dest = jnp.where(take, jnp.clip(rank // stride, 0, max_nodes - 1), max_nodes)
    pos = jnp.zeros((max_nodes + 1, 3)).at[dest].set(
        smap.data[sm.POS].T, mode="drop"
    )[:max_nodes]
    times = jnp.zeros((max_nodes + 1,)).at[dest].set(
        smap.data[sm.INIT_T], mode="drop"
    )[:max_nodes]
    valid = jnp.zeros((max_nodes + 1,), bool).at[dest].set(True, mode="drop")[
        :max_nodes
    ]
    eye = jnp.broadcast_to(jnp.eye(3), (max_nodes, 3, 3))
    return DeformationGraph(
        positions=pos, times=times, A=eye, t=jnp.zeros((max_nodes, 3)), valid=valid
    )


def _residuals(params, graph: DeformationGraph, cons_src, cons_dst, cons_valid,
               cons_times, cfg: DeformationConfig):
    """Stacked weighted residual vector (DeformationGraph energy terms)."""
    n = graph.num_nodes
    A = params[:, :9].reshape(n, 3, 3)
    t = params[:, 9:12]
    g = graph.positions
    vw = graph.valid.astype(jnp.float32)

    # rot: columns orthonormal (6 residuals per node, Sumner eq. 3)
    c0, c1, c2 = A[:, :, 0], A[:, :, 1], A[:, :, 2]
    rot = jnp.stack(
        [
            jnp.sum(c0 * c1, -1),
            jnp.sum(c0 * c2, -1),
            jnp.sum(c1 * c2, -1),
            jnp.sum(c0 * c0, -1) - 1.0,
            jnp.sum(c1 * c1, -1) - 1.0,
            jnp.sum(c2 * c2, -1) - 1.0,
        ],
        axis=-1,
    ) * vw[:, None]

    # reg: sequential +-k neighbours (3 residuals per directed edge)
    regs = []
    for d in range(1, cfg.k_neighbours // 2 + 1):
        for sgn in (-d, d):
            j = jnp.clip(jnp.arange(n) + sgn, 0, n - 1)
            pred = jnp.einsum("nij,nj->ni", A, g[j] - g) + g + t
            r = pred - (g[j] + t[j])
            w = vw * vw[j] * (jnp.arange(n) + sgn == j)
            regs.append(r * w[:, None])
    reg = jnp.concatenate(regs, axis=0)

    # con: deformed source points must land on their targets
    src_def = deform_points(cons_src, g, graph.times, A, t, graph.valid, cfg,
                            cons_times)
    con = (src_def - cons_dst) * cons_valid[:, None]

    import numpy as np

    return jnp.concatenate(
        [
            np.sqrt(cfg.w_rot) * rot.reshape(-1),
            np.sqrt(cfg.w_reg) * reg.reshape(-1),
            np.sqrt(cfg.w_con) * con.reshape(-1),
        ]
    )


def deform_points(
    points: jnp.ndarray,  # [P, 3]
    node_pos: jnp.ndarray,
    node_times: jnp.ndarray,
    A: jnp.ndarray,
    t: jnp.ndarray,
    node_valid: jnp.ndarray,
    cfg: DeformationConfig,
    point_times: jnp.ndarray,  # [P] init times (node candidates by time window)
    look_back: int = 20,
) -> jnp.ndarray:
    """Blend the k nearest (time-windowed) node transforms per point
    (copy_unstable.vert nodeSampler semantics)."""
    n = node_pos.shape[0]
    idx0 = jnp.searchsorted(node_times, point_times)  # [P]
    offs = jnp.arange(-look_back // 2, look_back - look_back // 2)
    cand = jnp.clip(idx0[:, None] + offs[None, :], 0, n - 1)  # [P, L]
    cpos = node_pos[cand]  # [P, L, 3]
    cvalid = node_valid[cand]
    d = jnp.linalg.norm(points[:, None] - cpos, axis=-1)
    d = jnp.where(cvalid, d, jnp.inf)
    # k nearest + the (k+1)-th as dmax (DeformationGraph computeWeights)
    k = cfg.k_neighbours
    neg = -d
    vals, sel = jax.lax.top_k(neg, k + 1)
    dk = -vals  # [P, k+1] ascending distances
    dmax = jnp.maximum(dk[:, k:k + 1], 1e-9)
    wgt = jnp.maximum(1.0 - dk[:, :k] / dmax, 0.0) ** 2
    wsum = jnp.sum(wgt, axis=-1, keepdims=True)
    # distance ties make every (1 - d/dmax)^2 weight vanish; fall back to a
    # uniform blend rather than collapsing the point to the origin
    wgt = jnp.where(wsum > 1e-9, wgt / jnp.maximum(wsum, 1e-9), 1.0 / k)
    nid = jnp.take_along_axis(cand, sel[:, :k], axis=1)  # [P, k]
    gk = node_pos[nid]
    Ak = A[nid]
    tk = t[nid]
    moved = jnp.einsum("pkij,pkj->pki", Ak, points[:, None] - gk) + gk + tk
    return jnp.sum(wgt[..., None] * moved, axis=1)


def optimise(
    graph: DeformationGraph,
    cons_src: jnp.ndarray,  # [C, 3] surface points at their CURRENT positions
    cons_dst: jnp.ndarray,  # [C, 3] where they must move to
    cons_valid: jnp.ndarray,  # [C]
    cons_times: jnp.ndarray,  # [C] init times of the constrained points
    cfg: DeformationConfig,
) -> DeformationGraph:
    """Gauss-Newton over all node transforms with a dense on-device solve."""
    n = graph.num_nodes

    def gn_step(params, _):
        r = _residuals(params, graph, cons_src, cons_dst, cons_valid,
                       cons_times, cfg)
        J = jax.jacfwd(
            lambda p: _residuals(p, graph, cons_src, cons_dst, cons_valid,
                                 cons_times, cfg)
        )(params).reshape(r.shape[0], -1)
        hi = jax.lax.Precision.HIGHEST
        JtJ = jnp.matmul(J.T, J, precision=hi) + 1e-6 * jnp.eye(J.shape[1])
        delta = jnp.linalg.solve(JtJ, -jnp.matmul(J.T, r, precision=hi))
        return params + delta.reshape(n, 12), None

    params0 = jnp.concatenate(
        [graph.A.reshape(n, 9), graph.t], axis=-1
    )
    params, _ = jax.lax.scan(gn_step, params0, None, length=cfg.iterations)
    return graph._replace(A=params[:, :9].reshape(n, 3, 3), t=params[:, 9:12])


def apply_to_map(smap: sm.SurfelMap, graph: DeformationGraph,
                 cfg: DeformationConfig) -> sm.SurfelMap:
    """Deform all live surfels with the optimised graph (copy_unstable apply)."""
    pts = smap.data[sm.POS].T
    times = smap.data[sm.INIT_T]
    moved = deform_points(
        pts, graph.positions, graph.times, graph.A, graph.t, graph.valid,
        cfg, times,
    )
    alive = smap.alive_mask()
    out = jnp.where(alive[:, None], moved, pts).T
    data = smap.data.at[sm.PX].set(out[0]).at[sm.PY].set(out[1]).at[sm.PZ].set(out[2])
    return sm.SurfelMap(data=data, count=smap.count)
