"""Multi-chip sharding: the production multi_frame_step over an 8-device mesh.

Validates the round-2 deliverable (VERDICT.md Next#1): the FULL multi-model
frame step — per-slot masked odometry, segmentation, lifecycle, fusion,
prediction — compiles and executes with the object-slot axis sharded over a
virtual 8-device CPU mesh, and its outputs match the unsharded program.

PROCESS ISOLATION: compiling the 8-device GSPMD executable SEGFAULTS inside
XLA's backend_compile when it happens late in a long pytest process (dozens
of prior compiled programs loaded); it compiles fine in a fresh process.
When this module runs inside the full suite (MMF_PARALLEL_INNER unset), a
single wrapper test re-runs the module in a clean subprocess; the real tests
execute there.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # 8-device GSPMD compiles take minutes on CPU

_INNER = os.environ.get("MMF_PARALLEL_INNER") == "1"

if not _INNER:

    def test_sharded_suite_in_clean_process():
        env = {**os.environ, "MMF_PARALLEL_INNER": "1"}
        r = subprocess.run(
            [sys.executable, "-m", "pytest", os.path.abspath(__file__),
             "-q", "--no-header"],
            env=env, capture_output=True, text=True, timeout=3000,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, (
            "sharded tests failed in subprocess:\n"
            + r.stdout[-4000:] + r.stderr[-2000:]
        )

else:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimotionfusion_tpu.parallel import (
        dryrun, mesh as meshlib, multi_model as mm,
    )


    @pytest.fixture(autouse=True, scope="module")
    def _no_persistent_cache_for_sharded():
        """jax's persistent-cache serialisation SEGFAULTS on the 8-device sharded
        multi_frame_step executable (reproducible in put_executable_and_time);
        single-device programs cache fine. Disable writes for this module only."""
        import jax
        from jax._src import compilation_cache as _cc

        old = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", None)
        _cc.reset_cache()  # the cache object latches the dir at first use
        yield
        jax.config.update("jax_compilation_cache_dir", old)
        _cc.reset_cache()

    N_DEV = 8


    @pytest.fixture(scope="module")
    def mesh():
        assert len(jax.devices()) >= N_DEV, "conftest provisions 8 virtual devices"
        return meshlib.make_mesh(N_DEV)


    @pytest.fixture(scope="module")
    def built():
        cfg = dryrun.tiny_config(n_slots=N_DEV)
        return dryrun.build_state(cfg)


    def test_sharded_full_step_matches_unsharded(mesh, built):
        eng, state, rgb2, depth2 = built

        ref_state, ref_stats, ref_mask, _ = dryrun.run_step(eng, state, rgb2, depth2)
        jax.block_until_ready(ref_state.pose)

        state_sh = mm.shard_multi_state(state, mesh)
        rgb_sh = mm.replicate(jnp.asarray(rgb2), mesh)
        depth_sh = mm.replicate(jnp.asarray(depth2), mesh)
        sh_state, sh_stats, sh_mask, _ = dryrun.run_step(eng, state_sh, rgb_sh, depth_sh)
        jax.block_until_ready(sh_state.pose)

        np.testing.assert_allclose(
            np.asarray(sh_state.pose), np.asarray(ref_state.pose), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(sh_state.objects.pose),
            np.asarray(ref_state.objects.pose),
            atol=1e-4,
        )
        assert np.array_equal(
            np.asarray(sh_state.objects.active), np.asarray(ref_state.objects.active)
        )
        # segmentation mask: identical up to reduction-order noise at region edges
        mismatch = np.mean(np.asarray(sh_mask) != np.asarray(ref_mask))
        assert mismatch < 0.01, f"mask mismatch fraction {mismatch}"
        # per-slot surfel maps evolve identically
        np.testing.assert_allclose(
            np.asarray(sh_state.objects.count), np.asarray(ref_state.objects.count)
        )
        np.testing.assert_allclose(
            np.asarray(sh_stats), np.asarray(ref_stats), rtol=1e-3, atol=1e-3
        )


    def test_sharded_state_placement(mesh, built):
        _, state, _, _ = built
        state_sh = mm.shard_multi_state(state, mesh)
        # slot axis is actually distributed: each device holds 1/8 of the slabs
        sharding = state_sh.objects.data.sharding
        shard_shape = sharding.shard_shape(state_sh.objects.data.shape)
        assert shard_shape[0] == state.objects.data.shape[0] // N_DEV
        # replicated leaves stay whole on every device
        g_shard = state_sh.smap.data.sharding.shard_shape(state_sh.smap.data.shape)
        assert g_shard == state_sh.smap.data.shape


    def test_track_models_batched_sharded_matches_vmap(mesh):
        """The dense-solver-only batched path (parallel/multi_model.py)."""
        from multimotionfusion_tpu.config import CameraModel, OdometryConfig
        from __graft_entry__ import _make_inputs

        cam = CameraModel(width=64, height=48, fx=52.8, fy=52.8, cx=32.0, cy=24.0)
        cfg = OdometryConfig()
        levels, last_l2 = _make_inputs(cam, cfg)
        m = N_DEV
        levels_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (m,) + x.shape), tuple(levels)
        )
        poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (m, 4, 4))
        mask_ids = jnp.zeros((m,), jnp.int32)

        ref = mm.track_models_batched(poses, levels_b, last_l2, mask_ids, cfg, cam)
        sh = mm.track_models_batched(
            mm.shard_model_batch(poses, mesh),
            mm.shard_model_batch(levels_b, mesh),
            mm.replicate(last_l2, mesh),
            mm.shard_model_batch(mask_ids, mesh),
            cfg,
            cam,
        )
        np.testing.assert_allclose(
            np.asarray(sh.pose), np.asarray(ref.pose), atol=1e-5
        )
