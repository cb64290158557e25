"""CLI flag surface: reference flags round-trip into EngineConfig.

Mirrors the documented reference flag list (GUI/MainController.cpp:40-122).
"""

import os

import numpy as np
import pytest

from multimotionfusion_tpu.app.main import build_parser, make_config


def _cfg(argv):
    return make_config(build_parser().parse_args(argv))


def test_tracking_and_window_flags():
    cfg = _cfg([
        "-d", "4.5", "-i", "20", "-or", "5", "-t", "111",
        "-fo", "-nso", "-ftf", "-rl", "-redetection",
    ])
    assert cfg.surfels.depth_cutoff == 4.5
    assert cfg.odometry.icp_weight == 20
    assert cfg.surfels.outlier_coeff == 5
    assert cfg.surfels.time_delta == 111
    assert cfg.odometry.fast_odom
    assert not cfg.odometry.so3_prealign
    assert cfg.frame_to_frame_rgb
    assert cfg.reloc_mode
    assert cfg.enable_redetection


def test_open_loop_and_fern_flags():
    cfg = _cfg(["-o", "-ft", "0.5", "-pt", "99"])
    assert cfg.surfels.time_delta >= 2**30
    assert cfg.ferns.encoding_threshold == 0.5
    assert cfg.ferns.photo_thresh == 99


def test_confidence_and_segmentation_flags():
    cfg = _cfg([
        "-confO", "0.5", "-confG", "7.0", "-segMinNew", "0.02",
        "-segMaxNew", "0.3", "-offset", "11", "-segm_mode", "crf",
    ])
    assert cfg.surfels.object_conf_threshold == 0.5
    assert cfg.surfels.conf_threshold == 7.0
    assert cfg.segmentation.min_rel_size_new == 0.02
    assert cfg.segmentation.max_rel_size_new == 0.3
    assert cfg.model_spawn_offset == 11
    assert cfg.segmentation.mode == "crf"


def test_superpoint_weights_flag():
    cfg = _cfg(["-model", "/path/to/SuperPointNet.pt"])
    assert cfg.keypoints.detector == "superpoint"
    assert cfg.keypoints.weights_path == "/path/to/SuperPointNet.pt"


def test_preallocate_and_keep():
    cfg = _cfg(["-a", "6", "-keep"])
    assert cfg.object_slots == 6
    assert cfg.min_inactive_surfels == 0


def test_defaults_match_reference():
    cfg = _cfg([])
    assert cfg.odom_init == "kp"
    assert cfg.icp_refine
    assert cfg.enable_multi_model
    assert cfg.surfels.conf_threshold == 10.0
    assert cfg.surfels.object_conf_threshold == 0.01
    assert cfg.ferns.encoding_threshold == 0.3095


def test_tum_ground_truth_cli(tmp_path):
    """'-p <gt.txt> -init tf' drives poses from the TUM file end-to-end."""
    from multimotionfusion_tpu.app.main import main as cli_main

    gt_file = tmp_path / "gt.txt"
    n = 4
    with open(gt_file, "w") as f:
        for i in range(n):
            # synthetic reader stamps frames at i/30 s (30 Hz log clock)
            f.write(f"{i / 30.0:.9f} {0.01 * i} 0 0 0 0 0 1\n")
    out = tmp_path / "out"
    rc = cli_main([
        "-l", "synthetic", "-dim", "80x60", "-frames", str(n), "-static",
        "-init", "tf", "-no_icp_refine", "-p", str(gt_file),
        "-exportdir", str(out), "-ep", "-q",
    ])
    assert rc == 0
    poses = np.loadtxt(out / "poses-0.txt")
    assert poses.shape == (n, 8)
    # exported x-translation tracks the ground-truth file (relative to first)
    np.testing.assert_allclose(
        poses[:, 1], [0.01 * i for i in range(n)], atol=1e-5
    )


def test_slice_flags(tmp_path):
    from multimotionfusion_tpu.app.main import main as cli_main

    out = tmp_path / "out"
    rc = cli_main([
        "-l", "synthetic", "-dim", "80x60", "-static", "-init", "none",
        "-s", "2", "-e", "8", "-skip", "2",
        "-exportdir", str(out), "-ep", "-q",
    ])
    assert rc == 0
    assert np.loadtxt(out / "poses-0.txt").shape == (3, 8)
