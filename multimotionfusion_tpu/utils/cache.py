"""Persistent XLA compilation cache.

The frame programs compile in 30-45 s through a tunnelled TPU backend —
1000x the 33 ms frame budget. The reference never recompiles (fixed
preallocation + precompiled CUDA/GLSL); the JAX equivalent is the persistent
compilation cache: every (program, shapes, statics) variant compiles ONCE per
machine, then loads in milliseconds in every later process — cold starts, the
benchmark, tests and the CLI all skip straight to steady state.

Called by the CLI, bench, the driver entry points and the test suite.
Override the location with MMF_JAX_CACHE; disable with MMF_JAX_CACHE=off.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    loc = path or os.environ.get("MMF_JAX_CACHE")
    if loc == "off":
        return None
    if not loc:
        repo = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        loc = (
            os.path.join(repo, ".jax_cache")
            if os.access(repo, os.W_OK)
            else os.path.expanduser("~/.cache/multimotionfusion_tpu/jax")
        )
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return loc
