"""Tests for the surfel map, rasteriser, fusion and clean passes.

Strategy (SURVEY.md §4): render a known synthetic scene, initialise a map from
frame 1, and assert geometric invariants of prediction/fusion that the
reference only ever validated by eye in the GUI.
"""

import jax.numpy as jnp
import numpy as np

from multimotionfusion_tpu.config import CameraModel, SurfelConfig
from multimotionfusion_tpu.model import fusion, surfel_map as sm
from multimotionfusion_tpu.model.fillin import fill_in
from multimotionfusion_tpu.ops import maps as mapops, rasterize
from tests import synthetic

CAM = CameraModel(width=80, height=60, fx=66.0, fy=66.0, cx=40.0, cy=30.0)
CFG = SurfelConfig(max_surfels=8192, depth_cutoff=5.0)


def _frame(T_wc=np.eye(4, dtype=np.float32), time=1, weighting=1.0):
    depth, rgb = synthetic.render(T_wc, CAM)
    depth = jnp.asarray(depth)
    rgb = jnp.asarray(rgb)
    vmap = mapops.create_vmap(depth, CAM, CFG.depth_cutoff)
    nmap = mapops.create_nmap(vmap)
    fs = sm.compute_frame_surfels(
        rgb, vmap, vmap, nmap, CAM, time, CFG.depth_cutoff, weighting
    )
    return fs, depth, rgb, vmap, nmap


def test_compact_and_append():
    data = jnp.arange(3 * 10, dtype=jnp.float32).reshape(3, 10)
    keep = jnp.array([1, 0, 1, 1, 0, 0, 1, 0, 0, 1], bool)
    out, count = sm.compact(data, keep, 6)
    assert int(count) == 5
    np.testing.assert_array_equal(np.asarray(out[0, :5]), [0, 2, 3, 6, 9])
    # append with overflow: capacity 6, 5 live, 3 new -> only 1 fits
    smap = sm.SurfelMap(data=jnp.zeros((3, 6)).at[:, :5].set(out[:, :5]), count=count)
    new = jnp.full((3, 4), 7.0)
    new_mask = jnp.array([True, False, True, True])
    smap2 = sm.append(smap, new, new_mask)
    assert int(smap2.count) == 6
    assert float(smap2.data[0, 5]) == 7.0


def test_init_from_frame_counts():
    fs, depth, rgb, _, _ = _frame()
    smap = sm.init_from_frame(fs, CFG.max_surfels)
    assert int(smap.count) == int(jnp.sum(fs.valid))
    assert int(smap.count) > 1000
    # live surfels carry the frame's colours and timestamps
    alive = np.asarray(smap.alive_mask())
    d = np.asarray(smap.data)
    assert np.all(d[sm.PZ, alive] > 0)
    assert np.all(d[sm.INIT_T, alive] == 1)
    assert np.all(d[sm.RADIUS, alive] > 0)


def test_predict_indices_roundtrip():
    fs, depth, _, _, _ = _frame()
    smap = sm.init_from_frame(fs, CFG.max_surfels)
    im = rasterize.predict_indices(
        smap, jnp.eye(4), CAM, time=1, time_delta=200, max_depth=CFG.depth_cutoff
    )
    idx = np.asarray(im.index)
    zimg = np.asarray(im.gather(sm.PZ))
    dref = np.asarray(depth)
    covered = idx >= 0
    # most valid-depth pixels are covered and agree with the frame depth
    valid = dref > 0
    assert covered[valid].mean() > 0.95
    err = np.abs(zimg[covered & valid] - dref[covered & valid])
    assert np.quantile(err, 0.95) < 0.02


def test_splat_predict_matches_frame():
    fs, depth, rgb, _, _ = _frame()
    smap = sm.init_from_frame(fs, CFG.max_surfels)
    pred = rasterize.splat_predict(
        smap, jnp.eye(4), CAM, conf_threshold=0.0, time=1, max_time=1,
        time_delta=200, max_depth=CFG.depth_cutoff,
    )
    dref = np.asarray(depth)
    valid = np.asarray(pred.valid)
    zpred = np.asarray(pred.vertex_conf[..., 2])
    mask = valid & (dref > 0)
    assert mask.mean() > 0.9
    err = np.abs(zpred[mask] - dref[mask])
    assert np.quantile(err, 0.95) < 0.05
    # colour of covered pixels close to the frame (splat may pick neighbours)
    cerr = np.abs(np.asarray(pred.color)[mask] - np.asarray(rgb)[mask])
    assert np.median(cerr) < 30.0


def test_fuse_merges_static_frame():
    fs1, depth, rgb, vmap, nmap = _frame(time=1)
    smap = sm.init_from_frame(fs1, CFG.max_surfels)
    n0 = int(smap.count)
    mask = jnp.zeros((CAM.height, CAM.width), jnp.int32)

    fs2, _, _, _, _ = _frame(time=2)
    im = rasterize.predict_indices(
        smap, jnp.eye(4), CAM, time=2, time_delta=200, max_depth=CFG.depth_cutoff
    )
    fused = fusion.fuse(
        smap, fs2, im, mask, 0, jnp.eye(4), CAM, time=2, cfg=CFG
    )
    # same static frame: almost everything associates, few new surfels appear
    growth = int(fused.count) - n0
    assert growth < 0.02 * n0
    # merged surfels accumulated confidence (weight roughly doubles on winners)
    assert float(jnp.max(fused.data[sm.CONF])) > float(jnp.max(smap.data[sm.CONF]))
    # merged surfels got their LAST_T bumped to the fuse tick
    assert float(jnp.max(fused.data[sm.LAST_T])) == 2.0


def _plant_phantom(smap, depth):
    """Insert a surfel 0.5 m in front of the wall on the optical axis."""
    n0 = int(smap.count)
    z_wall = float(np.asarray(depth)[int(CAM.cy), int(CAM.cx)])
    phantom = np.zeros((sm.CHANNELS,), np.float32)
    phantom[sm.PZ] = z_wall - 0.5
    phantom[sm.CONF] = 1.0
    phantom[sm.INIT_T] = 1.0
    phantom[sm.LAST_T] = 1.0
    phantom[sm.RADIUS] = 0.01
    phantom[sm.NZ] = -1.0
    phantom[sm.ALIVE] = 1.0
    data = smap.data.at[:, n0].set(jnp.asarray(phantom))
    return sm.SurfelMap(data=data, count=jnp.int32(n0 + 1)), n0


def test_clean_penalises_free_space_violations():
    fs1, depth, _, _, _ = _frame(time=1)
    smap = sm.init_from_frame(fs1, CFG.max_surfels)
    smap, n0 = _plant_phantom(smap, depth)
    im = rasterize.predict_indices(
        smap, jnp.eye(4), CAM, time=2, time_delta=200, max_depth=CFG.depth_cutoff
    )
    mask = jnp.zeros((CAM.height, CAM.width), jnp.int32)
    cleaned = fusion.clean(
        smap, im, depth, mask, 0, jnp.eye(4), CAM,
        time=2, time_delta=200, conf_threshold=10.0, cfg=CFG,
    )
    # young surfels all survive (age < unstable_grace)...
    assert int(cleaned.alive_count()) == n0 + 1
    # ...but the phantom sees the wall 0.5 m behind it from every neighbouring
    # pixel, so its confidence takes the 1/(1 + outlierCoeff*violation) hit
    # (storage is flag-based, not compacted, so the phantom stays at slot n0)
    phantom_conf = float(cleaned.data[sm.CONF, n0])
    assert phantom_conf < 1.0 / (1.0 + CFG.outlier_coeff * 0.4)


def test_clean_unstable_age_cull():
    fs1, depth, _, _, _ = _frame(time=1)
    smap = sm.init_from_frame(fs1, CFG.max_surfels)
    n0 = int(smap.count)
    # promote the first half to "stable" confidence
    half = n0 // 2
    conf = smap.data[sm.CONF]
    conf = conf.at[:half].set(20.0)
    smap = sm.SurfelMap(data=smap.data.at[sm.CONF].set(conf), count=smap.count)
    im = rasterize.predict_indices(
        smap, jnp.eye(4), CAM, time=25, time_delta=200, max_depth=CFG.depth_cutoff
    )
    mask = jnp.zeros((CAM.height, CAM.width), jnp.int32)
    cleaned = fusion.clean(
        smap, im, depth, mask, 0, jnp.eye(4), CAM,
        time=25, time_delta=200, conf_threshold=10.0, cfg=CFG,
    )
    # surfels that never reached conf_threshold within the grace period die;
    # the promoted ones survive (flag-cleared, not compacted)
    assert int(cleaned.alive_count()) == half


def test_fill_in_passthrough_and_holes():
    fs1, depth, rgb, vmap, nmap = _frame(time=1)
    smap = sm.init_from_frame(fs1, CFG.max_surfels)
    pred = rasterize.splat_predict(
        smap, jnp.eye(4), CAM, conf_threshold=1e9, time=1, max_time=1,
        time_delta=200, max_depth=CFG.depth_cutoff,
    )  # absurd conf threshold -> nothing splats -> all holes
    conf = sm.pixel_confidence(CAM, 1.0)
    rad = sm.radius_from_depth(vmap[..., 2], nmap[..., 2], CAM)
    filled = fill_in(pred, rgb, vmap, nmap, conf, rad)
    np.testing.assert_allclose(np.asarray(filled.color), np.asarray(rgb))
    np.testing.assert_allclose(
        np.asarray(filled.vertex_conf[..., :3]), np.asarray(vmap)
    )


def test_scatter_unique_indices_matches_safe_path():
    """fuse/append/compact promise unique_indices while their dst arrays hold
    MANY duplicated out-of-bounds sentinels (dropped by mode='drop'); pin that
    the optimised scatter equals the duplicate-safe path (ADVICE r1)."""
    rng = np.random.default_rng(7)
    cap = 512
    n = 2048
    data = jnp.asarray(rng.normal(size=(16, cap)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(16, n)).astype(np.float32))
    idx = np.full((n,), cap, np.int32)  # duplicated OOB sentinel
    uniq = rng.choice(cap, size=300, replace=False).astype(np.int32)
    idx[:300] = uniq
    dst = jnp.asarray(idx)
    fast = data.at[:, dst].set(vals, mode="drop", unique_indices=True)
    safe = data.at[:, dst].set(vals, mode="drop", unique_indices=False)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(safe))


def test_clean_compact_matches_flag_clear():
    """clean(compact=True) keeps exactly the surfels clean(compact=False)
    leaves alive, repacked densely with count == alive population."""
    fs1, depth, rgb, vmap, nmap = _frame(time=1)
    smap = sm.init_from_frame(fs1, CFG.max_surfels)
    im = rasterize.predict_indices(
        smap, jnp.eye(4), CAM, time=25, time_delta=200, max_depth=CFG.depth_cutoff
    )
    mask = jnp.zeros((CAM.height, CAM.width), jnp.int32)
    kw = dict(time=25, time_delta=200, conf_threshold=10.0, cfg=CFG)
    flagged = fusion.clean(smap, im, depth, mask, 0, jnp.eye(4), CAM, **kw)
    packed = fusion.clean(
        smap, im, depth, mask, 0, jnp.eye(4), CAM, compact=True, **kw
    )
    assert int(packed.count) == int(flagged.alive_count())
    assert int(packed.alive_count()) == int(flagged.alive_count())
    # survivors carry identical attributes (order-preserving repack)
    fa = np.asarray(flagged.data)[:, np.asarray(flagged.alive_mask())]
    pa = np.asarray(packed.data)[:, : int(packed.count)]
    np.testing.assert_array_equal(fa, pa)


def test_default_matmul_precision_pinned():
    """Importing the package must pin f32 matmuls to HIGHEST: TPU's default
    bf16 matmul precision corrupts one-hot id-selection matmuls (~2.3k
    representable values below 2^17 misdirected 97% of fusion merges) and
    compounds pose-composition error every frame."""
    import jax

    import multimotionfusion_tpu  # noqa: F401

    assert jax.config.jax_default_matmul_precision == "highest"
