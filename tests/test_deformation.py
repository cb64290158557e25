"""Embedded deformation graph: optimisation + application semantics."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from multimotionfusion_tpu.config import DeformationConfig
from multimotionfusion_tpu.model import deformation as dg, surfel_map as sm

CFG = DeformationConfig(max_nodes=32, k_neighbours=4, iterations=5)


def _line_graph(n=32):
    xs = np.linspace(0.0, 3.1, n).astype(np.float32)
    pos = np.stack([xs, np.zeros(n), np.full(n, 2.0)], axis=-1)
    return dg.DeformationGraph(
        positions=jnp.asarray(pos),
        times=jnp.arange(n, dtype=jnp.float32),
        A=jnp.broadcast_to(jnp.eye(3), (n, 3, 3)),
        t=jnp.zeros((n, 3)),
        valid=jnp.ones((n,), bool),
    )


def test_optimise_pulls_constraints_and_keeps_anchors():
    graph = _line_graph()
    # loop closure says: geometry near the END of the trajectory is 0.1 m off
    # in +y; geometry near the START is where it should be
    src_end = np.stack(
        [np.linspace(2.9, 3.1, 8), np.zeros(8), np.full(8, 2.0)], axis=-1
    ).astype(np.float32)
    dst_end = src_end + np.array([0.0, 0.1, 0.0], np.float32)
    src_start = np.stack(
        [np.linspace(0.0, 0.2, 8), np.zeros(8), np.full(8, 2.0)], axis=-1
    ).astype(np.float32)
    cons_src = jnp.asarray(np.concatenate([src_end, src_start]))
    cons_dst = jnp.asarray(np.concatenate([dst_end, src_start]))
    cons_valid = jnp.ones((16,), bool)
    cons_times = jnp.asarray(
        np.concatenate([np.full(8, 31.0), np.zeros(8)]).astype(np.float32)
    )

    opt = dg.optimise(graph, cons_src, cons_dst, cons_valid, cons_times, CFG)

    # end constraints satisfied
    moved_end = dg.deform_points(
        jnp.asarray(src_end), opt.positions, opt.times, opt.A, opt.t,
        opt.valid, CFG, jnp.full((8,), 31.0),
    )
    err_end = np.linalg.norm(np.asarray(moved_end) - dst_end, axis=1)
    assert err_end.max() < 0.02, err_end

    # anchored start barely moves
    moved_start = dg.deform_points(
        jnp.asarray(src_start), opt.positions, opt.times, opt.A, opt.t,
        opt.valid, CFG, jnp.zeros((8,)),
    )
    err_start = np.linalg.norm(np.asarray(moved_start) - src_start, axis=1)
    assert err_start.max() < 0.02, err_start

    # mid-trajectory points interpolate smoothly (monotone y displacement)
    mids = np.stack(
        [np.linspace(0.5, 2.7, 12), np.zeros(12), np.full(12, 2.0)], axis=-1
    ).astype(np.float32)
    mid_times = jnp.asarray(np.linspace(5, 27, 12).astype(np.float32))
    moved_mid = np.asarray(
        dg.deform_points(
            jnp.asarray(mids), opt.positions, opt.times, opt.A, opt.t,
            opt.valid, CFG, mid_times,
        )
    )
    dy = moved_mid[:, 1] - mids[:, 1]
    assert dy.min() > -0.02 and dy.max() < 0.12
    assert np.all(np.diff(dy) > -0.02)  # roughly monotone ramp

    # rotations stay near-orthonormal (wRot term)
    AtA = np.einsum("nij,nik->njk", np.asarray(opt.A), np.asarray(opt.A))
    assert np.abs(AtA - np.eye(3)).max() < 0.05


def test_sample_nodes_and_apply_smoke():
    cap = 4096
    n_alive = 1000
    rng = np.random.default_rng(0)
    data = np.zeros((sm.CHANNELS, cap), np.float32)
    data[sm.PX, :n_alive] = np.linspace(0, 3, n_alive)
    data[sm.PZ, :n_alive] = 2.0
    data[sm.INIT_T, :n_alive] = np.arange(n_alive) // 10
    data[sm.ALIVE, :n_alive] = 1.0
    smap = sm.SurfelMap(data=jnp.asarray(data), count=jnp.int32(n_alive))
    graph = dg.sample_nodes(smap, CFG.max_nodes)
    assert int(jnp.sum(graph.valid)) == CFG.max_nodes
    # identity graph leaves the map unchanged
    out = dg.apply_to_map(smap, graph, CFG)
    np.testing.assert_allclose(
        np.asarray(out.data[sm.PX, :n_alive]),
        data[sm.PX, :n_alive], atol=1e-5,
    )
