"""Legacy CoFusion CRF mode: SLIC superpixels + ICP-error-driven labels."""

import jax.numpy as jnp
import numpy as np

from multimotionfusion_tpu.config import CameraModel, SegmentationConfig
from multimotionfusion_tpu.segmentation import slic as slic_mod
from multimotionfusion_tpu.segmentation.legacy_crf import legacy_crf_segmentation
from tests import synthetic

CAM = CameraModel(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)


def test_slic_superpixels_coherent():
    d, rgb = synthetic.render(np.eye(4, dtype=np.float32), CAM)
    res = slic_mod.slic(jnp.asarray(rgb), sp_size=16)
    labels = np.asarray(res.labels)
    gy, gx = res.grid_hw
    assert labels.min() >= 0 and labels.max() < gy * gx
    # superpixels stay near their grid cells: mean xy within ~2 cells
    mxy = np.asarray(res.mean_xy)
    cy, cx = np.divmod(np.arange(gy * gx), gx)
    off = np.abs(mxy[:, 0] - (cx * 16 + 8)) + np.abs(mxy[:, 1] - (cy * 16 + 8))
    occupied = np.asarray(res.count) > 0
    assert np.median(off[occupied]) < 24
    # down/up-sample round trip: constant image survives exactly
    const = jnp.full((CAM.height, CAM.width), 3.25)
    down = slic_mod.downsample_to_superpixels(const, res)
    up = slic_mod.upsample_from_superpixels(down, res)
    np.testing.assert_allclose(np.asarray(up), 3.25, rtol=1e-6)


def test_legacy_crf_flags_high_icp_error_region():
    cfg = SegmentationConfig(min_rel_size_new=0.02, max_rel_size_new=0.5)
    d, rgb = synthetic.render(np.eye(4, dtype=np.float32), CAM)
    h, w = CAM.height, CAM.width
    # model 0 explains everything except a blob where its ICP error is high
    err0 = np.full((h, w), 0.001, np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    blob = (ys - 60) ** 2 + (xs - 100) ** 2 < 30**2
    err0[blob] = 0.3
    conf0 = np.ones((h, w), np.float32)
    res = legacy_crf_segmentation(
        jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(err0)[None],
        jnp.asarray(conf0)[None], jnp.array([True]), cfg,
    )
    assert bool(res.has_new_label)
    new = np.asarray(res.new_label_mask)
    inter = (new & blob).sum()
    union = (new | blob).sum()
    assert inter / union > 0.5, inter / union

    # uniform low error: nothing flagged
    res2 = legacy_crf_segmentation(
        jnp.asarray(rgb), jnp.asarray(d),
        jnp.full((1, h, w), 0.001), jnp.ones((1, h, w)),
        jnp.array([True]), cfg,
    )
    assert not bool(res2.has_new_label)
    assert (np.asarray(res2.mask) == 0).all()
