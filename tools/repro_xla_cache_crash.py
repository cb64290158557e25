"""Minimal standalone repro for the XLA:CPU crash that tests/conftest.py and
tests/test_parallel.py work around.

Symptom (jax 0.9.0, CPU backend, xla_force_host_platform_device_count=8):
after one process has compiled/loaded on the order of a hundred executables,
the NEXT compile or persistent-cache (de)serialisation SEGFAULTS or aborts —
deterministically in long pytest sessions, never when the same program runs
in a fresh process. Observed crash sites:
  - jax._src.compilation_cache.put_executable_and_time / get_executable_and_time
  - pjit backend_compile_and_load (8-device GSPMD programs hit it soonest)

Workarounds in this repo (each pointing here):
  - pytest.ini: `-n 4 --dist loadfile` — split the suite across worker
    processes so no single process accumulates enough executables;
  - tests/conftest.py: a hard cap on persistent-cache serialiser invocations
    per process (budget spent -> misses/no-ops instead of crashes);
  - tests/test_parallel.py + __graft_entry__.dryrun_multichip: the 8-device
    program compiles in a fresh subprocess / with cache writes disabled.

Usage: python tools/repro_xla_cache_crash.py [--programs 400] [--cache DIR]
Exit code 0 = survived (bug absent/fixed); a segfault/abort reproduces it.
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--programs", type=int, default=400,
                    help="distinct programs to compile in ONE process")
    ap.add_argument("--cache", default="/tmp/xla_crash_repro_cache",
                    help="persistent compilation cache dir ('' = disabled)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    if args.cache:
        os.makedirs(args.cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", args.cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (64, 128), jnp.float32)
    for i in range(args.programs):
        # each iteration is a DISTINCT program (shape-changing pad) so every
        # step compiles + loads a fresh executable and, with a cache dir,
        # exercises put/get_executable_and_time
        k = i % 97

        @jax.jit
        def prog(x, k=k):
            y = jnp.pad(x, ((0, k % 7), (0, k % 5)))
            return (y @ y.T).sum() + k

        v = float(prog(x))
        if i % 50 == 0:
            print(f"{i}/{args.programs} compiled, last={v:.3f}", flush=True)
    print("survived — bug not reproduced in this configuration")
    return 0


if __name__ == "__main__":
    sys.exit(main())
