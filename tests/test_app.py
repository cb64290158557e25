"""App-shell tests: CLI main, viewer renders, runtime control server."""

import os

import numpy as np

from multimotionfusion_tpu.app import control, viewer
from multimotionfusion_tpu.app.main import main as cli_main
from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
from multimotionfusion_tpu.engine import MultiMotionFusionTPU
from multimotionfusion_tpu.io.readers import SyntheticLogReader

CAM = CameraModel(width=80, height=60, fx=66.0, fy=66.0, cx=40.0, cy=30.0)


def _small_engine(n_frames=3):
    cfg = EngineConfig(
        camera=CAM, enable_multi_model=False, odom_init="",
        surfels=SurfelConfig(max_surfels=16384, depth_cutoff=5.0),
    )
    engine = MultiMotionFusionTPU(cfg)
    for f in SyntheticLogReader(CAM, num_frames=n_frames, cam_step=(0.003, 0, 0)):
        engine.process_frame(f)
    engine.finish()
    return engine


def test_cli_static_run(tmp_path):
    rc = cli_main([
        "-l", "synthetic", "-dim", "80x60", "-frames", "3", "-static",
        "-init", "none", "-exportdir", str(tmp_path), "-ep", "-q",
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "poses-0.txt")
    assert np.loadtxt(tmp_path / "poses-0.txt").shape == (3, 8)


def test_cli_batched_run(tmp_path):
    rc = cli_main([
        "-l", "synthetic", "-dim", "80x60", "-frames", "5", "-static",
        "-init", "none", "-exportdir", str(tmp_path), "-ep", "-batch", "2",
    ])
    assert rc == 0
    assert np.loadtxt(tmp_path / "poses-0.txt").shape == (5, 8)


def test_viewer_snapshot_and_orbit(tmp_path):
    engine = _small_engine()
    paths = viewer.snapshot(engine, str(tmp_path))
    assert any(p.endswith("view-color.png") for p in paths)
    assert any(p.endswith("view-normal.png") for p in paths)
    import cv2

    img = cv2.imread(str(tmp_path / "view-color.png"))
    assert img.shape == (CAM.height, CAM.width, 3)
    assert img.max() > 0  # something rendered
    out = viewer.orbit_video(
        engine, str(tmp_path / "orbit.mp4"), n_frames=4, conf_threshold=0.0
    )
    assert os.path.getsize(out) > 1000


def test_render_view_from_offset_pose():
    engine = _small_engine()
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.05  # view from 5 cm to the side
    view = viewer.render_view(
        engine.state.smap, T, CAM, conf_threshold=0.0, time=engine.tick,
    )
    assert view["valid"].mean() > 0.3  # most of the map still visible
    assert view["depth"][view["valid"]].min() > 0


def test_control_server_roundtrip():
    engine = _small_engine(2)
    srv = control.ControlServer(engine, port=0)  # ephemeral port
    try:
        r = control.send_command({"cmd": "stats"}, port=srv.port)
        assert r["ok"] and "surfels" in r["stats"]
        r = control.send_command({"cmd": "status"}, port=srv.port)
        assert r["ok"] and "tick=" in r["status"]
        r = control.send_command(
            {"cmd": "set_odom_init", "mode": ""}, port=srv.port
        )
        assert r["ok"] and engine.cfg.odom_init == ""
        r = control.send_command({"cmd": "pause"}, port=srv.port)
        assert r["ok"] and srv.paused
        r = control.send_command({"cmd": "start"}, port=srv.port)
        assert r["ok"] and not srv.paused
        r = control.send_command(
            {"cmd": "inhibit_new_models", "inhibit": True}, port=srv.port
        )
        assert r["ok"] and not engine.cfg.enable_model_spawning
        r = control.send_command({"cmd": "reset"}, port=srv.port)
        # state-mutating commands are queued; the frame loop applies them
        # between steps (see ControlServer.apply_pending)
        assert r["ok"] and r.get("queued")
        assert engine.tick != 1  # not yet applied
        srv.apply_pending()
        assert engine.tick == 1
        # live CRF tuning (reference GUI parameter panel)
        r = control.send_command(
            {"cmd": "set_segm_param", "name": "velocity_threshold",
             "value": 35.0}, port=srv.port,
        )
        assert r["ok"] and engine.cfg.segmentation.velocity_threshold == 35.0
        r = control.send_command(
            {"cmd": "set_segm_param", "name": "mode", "value": 1},
            port=srv.port,
        )
        assert not r["ok"]  # mode is not a numeric knob
        r = control.send_command({"cmd": "get_config"}, port=srv.port)
        assert r["ok"]
        assert r["config"]["segmentation"]["velocity_threshold"] == 35.0
        assert r["config"]["camera"]["width"] == CAM.width
        r = control.send_command({"cmd": "bogus"}, port=srv.port)
        assert not r["ok"]
    finally:
        srv.close()


def test_control_server_state_publishing():
    """RosStatePublisher parity: pose/object-pose/segmentation/view/cloud
    pulls (reference GUI/Tools/RosStatePublisher.cpp:71-120)."""
    import base64

    engine = _small_engine(2)
    srv = control.ControlServer(engine, port=0)
    try:
        r = control.send_command({"cmd": "get_pose"}, port=srv.port)
        assert r["ok"]
        pose = np.asarray(r["pose"])
        assert pose.shape == (4, 4)
        assert np.allclose(pose[3], [0, 0, 0, 1])

        r = control.send_command({"cmd": "get_object_poses"}, port=srv.port)
        assert r["ok"] and r["poses"] == []  # single-model engine: no slots

        r = control.send_command(
            {"cmd": "get_view", "kind": "color"}, port=srv.port
        )
        assert r["ok"]
        import cv2

        png = base64.b64decode(r["png"])
        img = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
        assert img.shape == (CAM.height, CAM.width, 3) and img.max() > 0

        r = control.send_command(
            {"cmd": "get_pointcloud", "id": 0, "max_points": 500},
            port=srv.port,
        )
        assert r["ok"] and 0 < r["count"] <= 500 and r["total"] >= r["count"]
        rows = np.frombuffer(
            base64.b64decode(r["data"]), np.float32
        ).reshape(r["count"], 6)
        assert np.isfinite(rows).all()
        assert rows[:, 2].max() > 0  # depth in front of the camera

        # no segmentation in single-model mode -> graceful error
        r = control.send_command({"cmd": "get_segmentation"}, port=srv.port)
        assert not r["ok"]
    finally:
        srv.close()


def test_control_server_subscribe_events():
    """Event push: new_model/inactive_model stream (Core/Callbacks.h)."""
    import json as _json
    import socket as _socket

    engine = _small_engine(2)
    srv = control.ControlServer(engine, port=0)
    try:
        # synthesize a lifecycle transition like multi_frame_step records
        engine._obj_pose_dev = [
            (0.0, np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
             np.array([False, False])),
            (1.0, np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
             np.array([True, False])),
            (2.0, np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
             np.array([False, False])),
        ]
        with _socket.create_connection(("127.0.0.1", srv.port), timeout=5) as s:
            with s.makefile("rw") as f:
                f.write(_json.dumps({"cmd": "subscribe"}) + "\n")
                f.flush()
                hello = _json.loads(f.readline())
                assert hello["ok"] and hello["subscribed"]
                srv.apply_pending()  # frame loop resolves + fans out events
                got = [_json.loads(f.readline()) for _ in range(2)]
        events = [g for g in got if g["type"] == "event"]
        assert [e["event"] for e in events] == ["new_model", "inactive_model"]
        assert all(e["id"] == 1 for e in events)
        assert events[0]["redetected"]  # active w/o spawn flag = redetection
    finally:
        srv.close()


def test_engine_model_listeners():
    """Direct listener registry parity (CallbackBuffer::addListener)."""
    engine = _small_engine(2)
    seen = []
    engine.add_model_listener("new_model", lambda ev: seen.append(ev))
    engine._obj_pose_dev = [
        (0.0, np.tile(np.eye(4, dtype=np.float32), (1, 1, 1)),
         np.array([False])),
        (1.0, np.tile(np.eye(4, dtype=np.float32), (1, 1, 1)),
         np.array([True])),
    ]
    evs = engine.drain_events()
    assert len(evs) == 1 and seen == evs
    assert engine.drain_events() == []  # cursor advanced; no replay


def test_control_server_stream_view():
    """Live view push stream (the reference GUI's running viewport,
    MainController.cpp:717-977): frames arrive while the engine advances."""
    import base64 as _b64
    import json as _json
    import socket as _socket

    import cv2

    engine = _small_engine(2)
    srv = control.ControlServer(engine, port=0)
    try:
        # generous socket timeout: each pushed frame may recompile the view
        # renderer at a new surfel bucket on the CPU test backend
        with _socket.create_connection(
            ("127.0.0.1", srv.port), timeout=600
        ) as s:
            f = s.makefile("rw")
            f.write(_json.dumps(
                {"cmd": "stream_view", "kind": "color", "hz": 20}
            ) + "\n")
            f.flush()
            ack = _json.loads(f.readline())
            assert ack["ok"] and ack["streaming"]
            first = _json.loads(f.readline())
            assert first["type"] == "view" and first["kind"] == "color"
            png = _b64.b64decode(first["png"])
            img = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
            assert img.shape == (CAM.height, CAM.width, 3) and img.max() > 0
            t0 = first["tick"]
            # advance the engine; the stream must push a NEW frame for it
            for fr in SyntheticLogReader(CAM, num_frames=4,
                                         cam_step=(0.003, 0, 0)):
                engine.process_frame(fr)
            engine.finish()
            second = _json.loads(f.readline())
            assert second["type"] == "view" and second["tick"] > t0
    finally:
        srv.close()
