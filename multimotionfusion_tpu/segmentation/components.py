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

    rowf = jnp.full((1, w), big)
    colf = jnp.full((h, 1), big)

    def sweep(lab, _):
        # slice+concat shifts, not roll+dynamic-update (a DUS per edge per
        # sweep serialises; concat of a slice and a constant row fuses)
        m = lab
        m = jnp.minimum(m, jnp.concatenate([rowf, lab[:-1, :]], axis=0))
        m = jnp.minimum(m, jnp.concatenate([lab[1:, :], rowf], axis=0))
        m = jnp.minimum(m, jnp.concatenate([colf, lab[:, :-1]], axis=1))
        m = jnp.minimum(m, jnp.concatenate([lab[:, 1:], colf], axis=1))
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


def keep_largest_components_batched(
    masks: jnp.ndarray, iters: int = 64
) -> jnp.ndarray:
    """keep_largest_component for a [L, H, W] stack in ONE batched sweep scan.

    The flow-CRF needs the largest blob of EVERY label; running the L label
    loops through one scan makes each sweep a [L, H, W] stencil instead of L
    sequential [H, W] ones (TPU: same bytes, 1/L the op count).
    """
    l, h, w = masks.shape
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w)
    big = jnp.int32(h * w)
    lab = jnp.where(masks, idx, big)

    rowf = jnp.full((l, 1, w), big)
    colf = jnp.full((l, h, 1), big)

    def sweep(lab, _):
        # slice+concat shifts, not roll+dynamic-update (see connected_components)
        m = lab
        m = jnp.minimum(m, jnp.concatenate([rowf, lab[:, :-1, :]], axis=1))
        m = jnp.minimum(m, jnp.concatenate([lab[:, 1:, :], rowf], axis=1))
        m = jnp.minimum(m, jnp.concatenate([colf, lab[:, :, :-1]], axis=2))
        m = jnp.minimum(m, jnp.concatenate([lab[:, :, 1:], colf], axis=2))
        return jnp.where(masks, m, big), None

    lab, _ = jax.lax.scan(sweep, lab, None, length=iters)
    flat = jnp.where(masks, lab, big).reshape(l, h * w)
    # per-label component sizes: offset each label's ids into its own bin row
    offs = (jnp.arange(l, dtype=jnp.int32) * (h * w + 1))[:, None]
    binned = jnp.where(masks.reshape(l, -1), flat + offs, l * (h * w + 1))
    sizes = jnp.zeros((l * (h * w + 1) + 1,), jnp.int32).at[
        binned.reshape(-1)
    ].add(1, mode="drop")
    sizes_l = sizes[: l * (h * w + 1)].reshape(l, h * w + 1)
    best = jnp.argmax(sizes_l[:, :-1], axis=1)  # [L] biggest component id
    return masks & (flat == best[:, None]).reshape(l, h, w)


def component_sizes_at_pixels(mask: jnp.ndarray, iters: int = 64) -> jnp.ndarray:
    """[H, W] size of the component each True pixel belongs to (0 outside)."""
    h, w = mask.shape
    lab = connected_components(mask, iters)
    flat = jnp.where(lab >= 0, lab, h * w).reshape(-1)
    sizes = jnp.zeros((h * w + 1,), jnp.int32).at[flat].add(1)
    sizes = sizes.at[h * w].set(0)
    return sizes[flat].reshape(h, w)
