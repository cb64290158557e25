"""Connected components and largest-blob selection on the device.

The reference uses CPU union-find (Core/Segmentation/ConnectedLabels.hpp:50-172)
and OpenCV findContours to keep the largest contour per label
(Segmentation.cpp:1256-1324). Union-find is pointer-chasing; here connected
components are iterative min-label propagation over the 4-neighbourhood —
each sweep is a stencil min, and `iters` sweeps resolve components whose
in-component geodesic diameter is <= iters (at the CRF's quarter resolution a
few dozen sweeps cover real segment shapes; pathological spirals degrade to
over-segmentation, which the size gates tolerate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def connected_components(mask: jnp.ndarray, iters: int = 64) -> jnp.ndarray:
    """Component ids for True pixels of `mask` [H, W]; -1 elsewhere.

    Ids are the minimum flat pixel index of the component (deterministic).
    """
    h, w = mask.shape
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    big = jnp.int32(h * w)
    lab = jnp.where(mask, idx, big)

    def sweep(lab, _):
        m = lab
        m = jnp.minimum(m, jnp.roll(lab, 1, 0).at[0, :].set(big))
        m = jnp.minimum(m, jnp.roll(lab, -1, 0).at[-1, :].set(big))
        m = jnp.minimum(m, jnp.roll(lab, 1, 1).at[:, 0].set(big))
        m = jnp.minimum(m, jnp.roll(lab, -1, 1).at[:, -1].set(big))
        return jnp.where(mask, m, big), None

    lab, _ = jax.lax.scan(sweep, lab, None, length=iters)
    return jnp.where(mask, lab, -1)


def keep_largest_component(mask: jnp.ndarray, iters: int = 64) -> jnp.ndarray:
    """True only on the largest connected component of `mask`.

    == the reference's largest-contour-per-model step
    (Segmentation.cpp:1256-1283).
    """
    h, w = mask.shape
    lab = connected_components(mask, iters)
    flat = jnp.where(lab >= 0, lab, h * w).reshape(-1)
    sizes = jnp.zeros((h * w + 1,), jnp.int32).at[flat].add(1)
    sizes = sizes.at[h * w].set(0)
    best = jnp.argmax(sizes)
    return lab == best


def component_sizes_at_pixels(mask: jnp.ndarray, iters: int = 64) -> jnp.ndarray:
    """[H, W] size of the component each True pixel belongs to (0 outside)."""
    h, w = mask.shape
    lab = connected_components(mask, iters)
    flat = jnp.where(lab >= 0, lab, h * w).reshape(-1)
    sizes = jnp.zeros((h * w + 1,), jnp.int32).at[flat].add(1)
    sizes = sizes.at[h * w].set(0)
    return sizes[flat].reshape(h, w)
