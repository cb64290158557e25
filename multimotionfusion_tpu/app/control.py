"""Runtime control channel: TCP JSON-lines server over the engine.

ROS-free counterpart of the reference's runtime control surface
(GUI/Tools/RosInterface.cpp:5-37 services + RosStatePublisher status topic):
every service maps to one JSON command. Protocol: one JSON object per line in,
one JSON object per line out.

    {"cmd": "stats"}                         -> {"ok": true, "stats": {...}}
    {"cmd": "reset"}                         -> {"ok": true}
    {"cmd": "pause"} / {"cmd": "start"}      -> {"ok": true}
    {"cmd": "set_odom_init", "mode": "kp"}   -> {"ok": true}
    {"cmd": "set_icp_refine", "enabled": true}
    {"cmd": "set_segm_mode", "mode": "flow_crf"}
    {"cmd": "inhibit_new_models", "inhibit": true}
    {"cmd": "deactivate_model", "id": 2}
    {"cmd": "status"}                        -> {"ok": true, "status": "..."}

The server runs on a daemon thread. Commands that only swap host-side control
state (config swaps, pause flag) apply immediately; commands that MUTATE
engine state (reset, deactivate_model) are queued and applied by the frame
loop between steps via ``apply_pending()`` — applying them from the server
thread could race a process_frame in flight (its ``self.state = ...``
assignment would silently undo a concurrent reset). This mirrors the
reference's mutex-guarded configs (MultiMotionFusion.h:368, Segmentation.h:162).
"""

from __future__ import annotations

import json
import queue
import socket
import threading
from typing import Optional


class ControlServer:
    def __init__(self, engine, host: str = "127.0.0.1", port: int = 45455):
        self.engine = engine
        self.paused = False
        self.stop_requested = False
        self._pending: queue.Queue = queue.Queue()
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
        with conn, conn.makefile("rw") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    reply = self._dispatch(json.loads(line))
                except Exception as e:  # noqa: BLE001 - report to client
                    reply = {"ok": False, "error": str(e)}
                f.write(json.dumps(reply) + "\n")
                f.flush()

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
        if cmd == "inhibit_new_models":
            e.set_inhibit_new_models(bool(msg.get("inhibit", True)))
            return {"ok": True}
        if cmd == "deactivate_model":
            self._pending.put(("deactivate_model", int(msg.get("id", -1))))
            return {"ok": True, "queued": True}
        return {"ok": False, "error": f"unknown cmd '{cmd}'"}

    def apply_pending(self):
        """Apply queued state-mutating commands; call between frame steps."""
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
