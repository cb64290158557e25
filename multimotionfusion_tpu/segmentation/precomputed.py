"""External-mask ("precomputed") segmentation.

== reference Core/Segmentation/Segmentation.cpp:89-147: when the user supplies
per-frame mask images (ImageLogReader Mask####.png), segmentation bypasses the
CRF entirely; each distinct external id maps to a model (ids seen before keep
their model, a sufficiently large NEW id drives spawning), id 0 = background.

TPU structure: the id<->slot mapping lives on device as a per-slot int
(ObjectSlots.ext_id), so the whole path stays inside the jitted frame step:
a 256-bin histogram of the mask gives per-id areas, per-slot equality tests
relabel the image into slot ids, and the largest unmapped id becomes the
spawn candidate consumed by the engine's regular claim machinery.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_MAX_IDS = 256  # uint8 external ids, reference MultiMotionFusion.cpp:983-999


class PrecomputedResult(NamedTuple):
    mask: jnp.ndarray  # [H, W] int32 slot ids (0 = global)
    new_label_mask: jnp.ndarray  # [H, W] bool — pixels of the spawn candidate
    has_new_label: jnp.ndarray  # [] bool
    new_ext_id: jnp.ndarray  # [] int32 external id of the candidate
    pixel_counts: jnp.ndarray  # [1 + S] int32 per-model areas
    reactivate: jnp.ndarray  # [S] bool — inactive slot whose id reappeared
    depth_mean: jnp.ndarray  # [1 + S] float32


def precomputed_segmentation(
    ext_mask: jnp.ndarray,  # [H, W] int32 raw external ids
    ext_ids: jnp.ndarray,  # [S] int32 per-slot external id (0 = unassigned)
    active: jnp.ndarray,  # [S] bool
    depth: jnp.ndarray,  # [H, W] float32
    min_px: int,
) -> PrecomputedResult:
    n_slots = ext_ids.shape[0]

    area = jnp.zeros((_MAX_IDS,), jnp.int32).at[
        jnp.clip(ext_mask.reshape(-1), 0, _MAX_IDS - 1)
    ].add(1)

    # relabel external ids -> slot ids (slot k owns mask id k+1)
    def slot_mask(k):
        return (ext_ids[k] > 0) & (ext_mask == ext_ids[k])

    per_slot = jax.vmap(slot_mask)(jnp.arange(n_slots))  # [S, H, W]
    mask = jnp.sum(
        per_slot * (jnp.arange(n_slots, dtype=jnp.int32) + 1)[:, None, None],
        axis=0,
    )

    slot_px = jnp.where(
        ext_ids > 0, area[jnp.clip(ext_ids, 0, _MAX_IDS - 1)], 0
    )
    reactivate = ~active & (ext_ids > 0) & (slot_px > 0)

    # spawn candidate: the LARGEST unmapped nonzero id above the size gate
    # (the reference iterates new mask ids and spawns per id,
    # Segmentation.cpp:115-139; one per frame here — the spawn cool-down
    # serialises multiple new objects over a few frames either way)
    in_use = jnp.zeros((_MAX_IDS,), bool).at[
        jnp.clip(ext_ids, 0, _MAX_IDS - 1)
    ].set(ext_ids > 0, mode="drop")
    cand = (area >= min_px) & ~in_use
    cand = cand.at[0].set(False)
    new_ext = jnp.argmax(jnp.where(cand, area, -1))
    has_new = jnp.any(cand)
    new_label_mask = has_new & (ext_mask == new_ext)

    bg_px = area[0]
    pixel_counts = jnp.concatenate([bg_px[None], slot_px])

    m_all = 1 + n_slots
    lbl = jnp.where(new_label_mask, -1, mask)  # candidate pixels belong to no model yet

    def dmean(k):
        sel = (lbl == k) & (depth > 0)
        return jnp.sum(jnp.where(sel, depth, 0.0)) / jnp.maximum(
            jnp.sum(sel.astype(jnp.int32)), 1
        )

    depth_mean = jax.vmap(dmean)(jnp.arange(m_all))
    return PrecomputedResult(
        mask=mask,
        new_label_mask=new_label_mask,
        has_new_label=has_new,
        new_ext_id=new_ext.astype(jnp.int32),
        pixel_counts=pixel_counts,
        reactivate=reactivate,
        depth_mean=depth_mean,
    )
