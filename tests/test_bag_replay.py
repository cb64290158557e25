"""CLI-level bag -> ATE replay: the reference's de-facto integration test.

The reference's integration protocol is deterministic bag replay with the
exported `poses-0.txt` diffed against the bag's tf ground truth
(reference README.md:204-233; sync algorithm GUI/Tools/RosBagReader.cpp:200-253).
This test builds a real ROS1 bag (message layout from test_rosbag's writer)
whose frames are rendered from a known camera trajectory, runs the actual CLI
entry point `app.main -l t.bag -init tf -ep -exportdir ...`, parses the
exported TUM trajectory, and asserts camera ATE against the tf chain —
the full reader -> engine -> exporter path in one assert.
"""

import numpy as np

from multimotionfusion_tpu.config import CameraModel
from multimotionfusion_tpu.io import synthetic

from test_rosbag import S, BagWriter, ser_camera_info, ser_image, ser_tf

CAM = CameraModel(width=80, height=60, fx=66.0, fy=66.0, cx=40.0, cy=30.0)


def _make_slam_bag(path, n=24, step=0.004):
    """Bag with a rendered synthetic scene + /tf ground truth of the camera.

    Camera translates +x by `step` m/frame; tf carries the exact motion
    (world -> cam_color), so `-init tf` seeds every frame with ground truth
    and the exported trajectory must match it up to dense-refinement error.
    """
    w = BagWriter(path)
    ci = w.connection("/cam/color/camera_info", "sensor_msgs/CameraInfo")
    col = w.connection("/cam/color/image_raw", "sensor_msgs/Image")
    dep = w.connection("/cam/depth/image_raw", "sensor_msgs/Image")
    tf = w.connection("/tf", "tf2_msgs/TFMessage")
    w.message(ci, S, ser_camera_info(S, "cam_color", CAM.width, CAM.height,
                                     CAM.fx, CAM.fy, CAM.cx, CAM.cy))
    gt_t = []
    for i in range(n):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = step * i
        depth, rgb = synthetic.render(T, CAM)
        t = S + i * (S // 30)
        w.message(col, t, ser_image(t, "cam_color", rgb.astype(np.uint8),
                                    "rgb8"))
        dmm = np.round(depth * 1000.0).astype(np.uint16)
        w.message(dep, t, ser_image(t, "cam_color", dmm, "16uc1"))
        w.message(tf, t, ser_tf([
            (t, "world", "cam_color", (step * i, 0.0, 0.0), (0, 0, 0, 1)),
        ]))
        gt_t.append(T[:3, 3].copy())
    w.write()
    return np.stack(gt_t)


def test_bag_cli_replay_ate(tmp_path):
    from multimotionfusion_tpu.app.main import main

    bag = tmp_path / "replay.bag"
    n, step = 24, 0.004
    gt_t = _make_slam_bag(str(bag), n=n, step=step)
    out = tmp_path / "out"
    # -dim at the bag's native size: without it the reader scales frames up
    # to the 640x480 default (reference ros_common/-dim semantics), which
    # only burns CPU-suite minutes on interpolated pixels
    rc = main([
        "-l", str(bag), "-init", "tf", "-static", "-ep", "-q", "-run",
        "-dim", f"{CAM.width}x{CAM.height}",
        "-exportdir", str(out),
    ])
    assert rc == 0

    est = np.loadtxt(out / "poses-0.txt")
    assert est.shape == (n, 8), est.shape  # ts x y z qx qy qz qw
    # timestamps preserved through reader -> engine -> exporter
    ts = est[:, 0]
    assert abs(ts[0] - 1.0) < 1e-6
    assert np.all(np.diff(ts) > 0)

    # camera ATE vs the bag's tf ground truth (poses are both relative to
    # the first frame)
    err = np.linalg.norm(est[:, 1:4] - gt_t, axis=-1)
    ate = np.sqrt(np.mean(err**2))
    path_len = (n - 1) * step
    # 8% of path: looser than the ate-gate's 5% because the bag carries
    # mm-QUANTIZED uint16 depth (the reference wire format) — 1 mm steps
    # against 4 mm/frame motion; accuracy itself is test_ate_gate's job
    assert ate < 0.08 * path_len, (ate, path_len)

    # rotation stays near identity (the GT trajectory is translation-only)
    qn = np.linalg.norm(est[:, 4:7], axis=-1)  # |xyz| of the quaternion
    assert np.max(qn) < 0.02, np.max(qn)
