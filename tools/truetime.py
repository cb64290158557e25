"""Ground-truth device timing on the axon tunnel backend.

`jax.block_until_ready` does NOT block on this backend (measured: an 8192
bf16 matmul "completes" in 34 us = 32 PF/s), and a single host readback pays
a multi-ms tunnel round trip. The ONLY reliable number is a SLOPE: run a
sequential dependency chain of K steps, force one readback at the end, and
fit time(K2) - time(K1) / (K2 - K1). RTT and dispatch overhead cancel.

time_chain(step, init, ...) returns ms per step for any step: state -> state.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def _sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(leaf.ravel()[0:1])  # slice ON DEVICE; transfer 1 element


def time_chain(step, init, k_lo: int = 8, k_hi: int = 104, outer: int = 5):
    """ms per step of `step` (state -> state), slope-measured.

    Runs k_lo and k_hi sequential iterations (state threaded through so the
    device cannot overlap steps), one readback each; repeats `outer` times
    and takes the MEDIAN slope.
    """
    s = init
    for _ in range(2):  # warm any remaining compile+cache paths
        s = step(s)
    _sync(s)

    def run(k):
        s = init
        t0 = time.perf_counter()
        for _ in range(k):
            s = step(s)
        _sync(s)
        return time.perf_counter() - t0

    slopes = []
    for _ in range(outer):
        t_lo = run(k_lo)
        t_hi = run(k_hi)
        slopes.append((t_hi - t_lo) / (k_hi - k_lo) * 1e3)
    return float(np.median(slopes))


def time_fn(fn, *args, k_lo: int = 8, k_hi: int = 104, outer: int = 5):
    """ms per call for a side-effect-free fn(*args) with constant args.

    The calls have no data dependence, so the device may pipeline them; this
    measures THROUGHPUT per call (what a production loop sees), which for
    one-chip synchronous programs equals device time per call.
    """

    def step(_):
        return fn(*args)

    return time_chain(step, None, k_lo=k_lo, k_hi=k_hi, outer=outer)
