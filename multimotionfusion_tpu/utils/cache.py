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
    # segregate entries per host CPU: jax's cache key does NOT cover host
    # machine features, so a CPU AOT executable compiled on (say) an AMX
    # machine gets loaded on a host without AMX — XLA warns "could lead to
    # execution errors such as SIGILL" and we observed hard aborts mid-suite.
    # TPU executables are host-agnostic, but the virtual-CPU-mesh tests are
    # exactly the entries that differ.
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            cpu = f.read()
        # the full model line + flags: two machines reported IDENTICAL flag
        # sets in round 5 while XLA chose different codegen preferences
        # (+prefer-no-scatter AOT entries loaded onto a host without them,
        # warning "could lead to execution errors" — and numerics differed
        # between cache-loaded and fresh-compiled runs, which made
        # borderline lifecycle tests flip between identical invocations)
        flags = "".join(
            ln for ln in cpu.splitlines()
            if ln.startswith(("flags", "model name"))
        )
    except OSError:
        flags = platform.machine()
    import jax

    ver = getattr(jax, "__version__", "")
    try:
        import jaxlib

        ver += "+" + getattr(jaxlib, "__version__", "")
    except Exception:
        pass
    tag = hashlib.sha1((str(flags) + ver).encode()).hexdigest()[:12]
    loc = os.path.join(loc, f"host-{tag}")

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return loc
