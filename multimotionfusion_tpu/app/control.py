"""Runtime control channel: TCP JSON-lines server over the engine.

ROS-free counterpart of the reference's runtime control surface
(GUI/Tools/RosInterface.cpp:5-37 services) AND its state publisher
(GUI/Tools/RosStatePublisher.cpp:71-120: segmentation image, per-model
pointclouds, camera/object poses, status string): every service maps to one
JSON command; every published topic maps to a pull command or, for events,
a push subscription. Protocol: one JSON object per line in, one JSON object
per line out.

    {"cmd": "stats"}                         -> {"ok": true, "stats": {...}}
    {"cmd": "reset"}                         -> {"ok": true}
    {"cmd": "pause"} / {"cmd": "start"}      -> {"ok": true}
    {"cmd": "set_odom_init", "mode": "kp"}   -> {"ok": true}
    {"cmd": "set_icp_refine", "enabled": true}
    {"cmd": "set_segm_mode", "mode": "flow_crf"}
    {"cmd": "inhibit_new_models", "inhibit": true}
    {"cmd": "deactivate_model", "id": 2}
    {"cmd": "status"}                        -> {"ok": true, "status": "..."}

State publishing (RosStatePublisher parity):

    {"cmd": "get_pose"}                      -> camera pose, 4x4 row-major
    {"cmd": "get_object_poses"}              -> per-slot poses + active mask
    {"cmd": "get_segmentation"}              -> latest mask, PNG base64
    {"cmd": "get_view", "kind": "color"}     -> predicted color/depth/normal PNG
    {"cmd": "get_pointcloud", "id": 0, "max_points": 65536}
        -> base64 float32 [N, 6] xyz+rgb rows of model <id>'s live surfels;
        id = -1 -> [N, 7] xyz+rgb+model COMBINED world-frame scene (objects
        placed at P_0 P_m^-1) for the 3D viewer (tools/live_viewer.py --mode cloud)
    {"cmd": "subscribe"}                     -> switches this connection into
        a push stream of model lifecycle events (new_model/inactive_model,
        reference Core/Callbacks.h) and periodic status lines
    {"cmd": "stream_view", "kind": "color", "hz": 5} -> switches this
        connection into a live PNG frame stream of the running session
        (color/depth/normal renders or the colourised label mask) — the
        reference GUI's live viewport (tools/live_viewer.py is the client)

The server runs on a daemon thread. Commands that only swap host-side control
state (config swaps, pause flag) apply immediately; commands that MUTATE
engine state (reset, deactivate_model) are queued and applied by the frame
loop between steps via ``apply_pending()`` — applying them from the server
thread could race a process_frame in flight (its ``self.state = ...``
assignment would silently undo a concurrent reset). This mirrors the
reference's mutex-guarded configs (MultiMotionFusion.h:368, Segmentation.h:162).
"""

from __future__ import annotations

import base64
import json
import queue
import socket
import threading
from typing import Optional

import numpy as np


def _png_b64(img: np.ndarray) -> str:
    """Encode an image (u8 grayscale or RGB) as base64 PNG."""
    import cv2

    img = np.asarray(img)
    if img.ndim == 3:
        img = img[..., ::-1]  # RGB -> BGR for cv2
    ok, buf = cv2.imencode(".png", img)
    if not ok:
        raise RuntimeError("png encode failed")
    return base64.b64encode(buf.tobytes()).decode("ascii")


class ControlServer:
    def __init__(self, engine, host: str = "127.0.0.1", port: int = 45455):
        self.engine = engine
        self.paused = False
        self.stop_requested = False
        self._pending: queue.Queue = queue.Queue()
        self._subs: list = []  # per-subscriber event queues
        # fan lifecycle events out to subscribed connections (the reference
        # wires RosStatePublisher into Core's CallbackBuffers the same way)
        if hasattr(engine, "add_model_listener"):
            for ev in ("new_model", "inactive_model"):
                engine.add_model_listener(ev, self._publish_event)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(4)
        self.port = self._sock.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        while True:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn: socket.socket):
        try:
            self._handle_conn(conn)
        except (OSError, ValueError):
            pass  # client hung up mid-write / socket already closed

    def _handle_conn(self, conn: socket.socket):
        with conn, conn.makefile("rw") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    msg = json.loads(line)
                    if msg.get("cmd") == "stream_view":
                        f.write(json.dumps({"ok": True, "streaming": True})
                                + "\n")
                        f.flush()
                        self._stream_view(f, msg)  # blocks until hang-up
                        return
                    if msg.get("cmd") == "subscribe":
                        # register BEFORE acking: a client may trigger event
                        # drains the moment it reads the ack
                        q: queue.Queue = queue.Queue()
                        self._subs.append(q)
                        f.write(json.dumps({"ok": True, "subscribed": True})
                                + "\n")
                        f.flush()
                        self._stream(f, q)  # blocks until the client hangs up
                        return
                    reply = self._dispatch(msg)
                except Exception as e:  # noqa: BLE001 - report to client
                    reply = {"ok": False, "error": str(e)}
                f.write(json.dumps(reply) + "\n")
                f.flush()

    def _stream_view(self, f, msg: dict):
        """Continuous live view over one connection — the TCP counterpart of
        the reference GUI's running 3D viewport (MainController.cpp:717-977).

        Pushes {"type": "view", "tick": N, "png": ...} JSON lines at up to
        `hz` (default 5) whenever the engine has advanced; `kind` picks
        color / depth / normal (rendered from the live global map) or
        label (latest segmentation, colourised). Rendering happens on THIS
        connection's thread, so a slow client only throttles itself."""
        import time as _time

        kind = msg.get("kind", "color")
        hz = max(0.2, min(float(msg.get("hz", 5.0)), 30.0))
        last_tick = -1
        try:
            while True:
                e = self.engine
                tick = e.tick
                if tick != last_tick and e.state is not None:
                    last_tick = tick
                    if kind == "label":
                        r = self._dispatch(
                            {"cmd": "get_segmentation", "colorize": True}
                        )
                    else:
                        r = self._dispatch({"cmd": "get_view", "kind": kind})
                    if r.get("ok"):
                        f.write(json.dumps(
                            {"type": "view", "tick": tick, "kind": kind,
                             "png": r["png"]}
                        ) + "\n")
                        f.flush()
                _time.sleep(1.0 / hz)
        except (OSError, ValueError):
            pass  # client hung up

    def _publish_event(self, ev: dict):
        for q in list(self._subs):
            q.put({"type": "event", **ev})

    def _stream(self, f, q: queue.Queue):
        """Push lifecycle events + periodic status to one subscriber
        (RosStatePublisher's status topic + Callbacks.h event surface)."""
        try:
            while True:
                try:
                    item = q.get(timeout=2.0)
                except queue.Empty:
                    item = {"type": "status",
                            **self._dispatch({"cmd": "status"})}
                    item.pop("ok", None)
                f.write(json.dumps(item) + "\n")
                f.flush()
        except (OSError, ValueError):
            pass  # client hung up
        finally:
            self._subs.remove(q)

    def _dispatch(self, msg: dict) -> dict:
        cmd = msg.get("cmd", "")
        e = self.engine
        if cmd == "stats":
            return {"ok": True, "stats": e.current_stats(sync=False)}
        if cmd == "status":
            s = e.current_stats(sync=False)
            return {
                "ok": True,
                "status": f"tick={e.tick} surfels={s.get('surfels', 0):.0f} "
                f"icp_error={s.get('icp_error', 0):.3e}",
            }
        if cmd == "reset":
            self._pending.put(("reset", None))
            return {"ok": True, "queued": True}
        if cmd == "pause":
            self.paused = True
            return {"ok": True}
        if cmd == "start":
            self.paused = False
            return {"ok": True}
        if cmd == "stop":
            self.stop_requested = True
            return {"ok": True}
        if cmd == "set_odom_init":
            e.set_odom_init(msg.get("mode", ""))
            return {"ok": True}
        if cmd == "set_icp_refine":
            e.set_icp_refine(bool(msg.get("enabled", True)))
            return {"ok": True}
        if cmd == "set_segm_mode":
            e.set_segm_mode(msg.get("mode", "flow_crf"))
            return {"ok": True}
        if cmd == "set_segm_param":
            # live CRF tuning (the reference GUI's parameter panel,
            # MainController.cpp:643-670)
            e.set_segm_param(msg["name"], msg["value"])
            return {"ok": True}
        if cmd == "get_config":
            from multimotionfusion_tpu.engine import dataclasses_asdict_safe

            return {"ok": True, "config": dataclasses_asdict_safe(e.cfg)}
        if cmd == "inhibit_new_models":
            e.set_inhibit_new_models(bool(msg.get("inhibit", True)))
            return {"ok": True}
        if cmd == "deactivate_model":
            self._pending.put(("deactivate_model", int(msg.get("id", -1))))
            return {"ok": True, "queued": True}
        # ---- state publishing (GUI/Tools/RosStatePublisher.cpp:71-120) ----
        if cmd == "get_pose":
            if e.state is None:
                return {"ok": False, "error": "no frames processed yet"}
            return {
                "ok": True,
                "tick": e.tick,
                "pose": np.asarray(e.state.pose, np.float64).tolist(),
            }
        if cmd == "get_object_poses":
            if not e._obj_pose_dev:
                return {"ok": True, "poses": [], "active": [], "timestamp": None}
            ts, poses, active = e._obj_pose_dev[-1]
            cam = np.asarray(e.state.pose, np.float64)
            slot = np.asarray(poses, np.float64)
            # world-frame object pose = cam_pose @ inv(slot_pose)
            # (Model::getPose composition; same math as store_models)
            world = [
                (cam @ np.linalg.inv(slot[k])).tolist()
                for k in range(slot.shape[0])
            ]
            return {
                "ok": True,
                "timestamp": ts,
                "poses": world,
                "active": np.asarray(active).astype(bool).tolist(),
            }
        if cmd == "get_segmentation":
            if e.last_mask is None:
                return {"ok": False, "error": "no segmentation yet"}
            m = np.asarray(e.last_mask)
            if msg.get("colorize"):
                from multimotionfusion_tpu.app import viewer

                img = viewer.colorize_labels(m)
            else:
                img = m.astype(np.uint8)
            return {"ok": True, "png": _png_b64(img), "shape": list(m.shape)}
        if cmd == "get_view":
            if e.state is None:
                return {"ok": False, "error": "no frames processed yet"}
            from multimotionfusion_tpu.app import viewer

            kind = msg.get("kind", "color")
            view = viewer.render_view(
                e.state.smap, np.asarray(e.state.pose), e.cam,
                conf_threshold=e.cfg.surfels.conf_threshold,
                time=e.tick, time_delta=e.time_delta,
                max_depth=e.cfg.surfels.depth_cutoff,
            )
            if kind == "depth":
                img = viewer.depth_norm(view["depth"], e.cfg.surfels.depth_cutoff)
            elif kind in ("color", "normal"):
                img = view[kind]
            else:
                return {"ok": False, "error": f"unknown view kind '{kind}'"}
            return {"ok": True, "png": _png_b64(img)}
        if cmd == "get_pointcloud":
            return self._pointcloud(int(msg.get("id", 0)),
                                    int(msg.get("max_points", 65536)))
        return {"ok": False, "error": f"unknown cmd '{cmd}'"}

    def _pointcloud(self, model_id: int, max_points: int) -> dict:
        """xyz+rgb rows of one model's live surfels (the reference publishes
        these per model as sensor_msgs/PointCloud2,
        RosStatePublisher.cpp:71-120). id = -1 returns the COMBINED scene in
        the WORLD frame — every active object's model-frame surfels mapped
        through P_0 P_m^-1 (the exportPoses object-in-world convention) and
        tagged with a 7th column `m` (model id) so a 3D viewer can tint per
        model — the reference GUI's main viewport content
        (MainController.cpp:717-977 draws each model under its own pose)."""
        from multimotionfusion_tpu.model import surfel_map as sm

        e = self.engine
        if model_id == -1:
            if e.state is None:
                return {"ok": False, "error": "no frames processed yet"}
            d = e.global_model.download()
            p0 = np.asarray(e.state.pose, np.float64)
            parts = [np.concatenate(
                [d["position"].astype(np.float32),
                 d["color"].astype(np.float32),
                 np.zeros((d["position"].shape[0], 1), np.float32)], axis=1
            )]
            if e.mstate is not None:
                obj = e.mstate.objects
                active = np.asarray(obj.active)
                poses = np.asarray(obj.pose, np.float64)
                data = np.asarray(obj.data)
                for k in range(data.shape[0]):
                    if not active[k]:
                        continue
                    dk = data[k]
                    alive = dk[sm.ALIVE] > 0
                    pos_m = dk[sm.POS].T[alive]
                    col_m = dk[sm.COLOR].T[alive]
                    t_wm = p0 @ np.linalg.inv(poses[k])
                    pos_w = pos_m @ t_wm[:3, :3].T + t_wm[:3, 3]
                    parts.append(np.concatenate(
                        [pos_w.astype(np.float32), col_m.astype(np.float32),
                         np.full((pos_w.shape[0], 1), k + 1, np.float32)],
                        axis=1,
                    ))
            rows = np.concatenate(parts, axis=0)
            n = rows.shape[0]
            if n > max_points > 0:
                idx = np.linspace(0, n - 1, max_points).astype(np.int64)
                rows = rows[idx]
            return {
                "ok": True,
                "count": int(rows.shape[0]),
                "total": int(n),
                "dtype": "<f4",
                "columns": ["x", "y", "z", "r", "g", "b", "m"],
                "data": base64.b64encode(
                    np.ascontiguousarray(rows).tobytes()
                ).decode(),
            }
        if model_id == 0:
            if e.state is None:
                return {"ok": False, "error": "no frames processed yet"}
            d = e.global_model.download()
            pos, col = d["position"], d["color"]
        else:
            if e.mstate is None:
                return {"ok": False, "error": "multi-model mode not active"}
            k = model_id - 1
            obj = e.mstate.objects
            if not (0 <= k < obj.data.shape[0]):
                return {"ok": False, "error": f"no model id {model_id}"}
            d = np.asarray(obj.data[k])
            alive = d[sm.ALIVE] > 0
            pos = d[sm.POS].T[alive]
            col = d[sm.COLOR].T[alive]
        n = pos.shape[0]
        if n > max_points > 0:
            idx = np.linspace(0, n - 1, max_points).astype(np.int64)
            pos, col = pos[idx], col[idx]
        rows = np.concatenate(
            [pos.astype(np.float32), col.astype(np.float32)], axis=1
        )
        return {
            "ok": True,
            "count": int(rows.shape[0]),
            "total": int(n),
            "dtype": "<f4",
            "columns": ["x", "y", "z", "r", "g", "b"],
            "data": base64.b64encode(np.ascontiguousarray(rows).tobytes())
            .decode("ascii"),
        }

    def apply_pending(self):
        """Apply queued state-mutating commands; call between frame steps.
        Also resolves lifecycle events (drain_events fires the listeners that
        feed subscribed connections) — but only when someone is listening, so
        the sync-free frame loop stays sync-free otherwise."""
        if self._subs and hasattr(self.engine, "drain_events"):
            try:
                self.engine.drain_events()
            except Exception:  # noqa: BLE001 - never kill the frame loop
                pass
        while True:
            try:
                cmd, arg = self._pending.get_nowait()
            except queue.Empty:
                return
            if cmd == "reset":
                self.engine.reset()
            elif cmd == "deactivate_model":
                self.engine.deactivate_model(arg)

    def close(self):
        try:
            self._sock.close()
        except OSError:
            pass


def send_command(msg: dict, host: str = "127.0.0.1", port: int = 45455,
                 timeout: float = 5.0) -> Optional[dict]:
    """One-shot client helper (used by tests and external tooling)."""
    with socket.create_connection((host, port), timeout=timeout) as s:
        with s.makefile("rw") as f:
            f.write(json.dumps(msg) + "\n")
            f.flush()
            line = f.readline()
    return json.loads(line) if line else None
