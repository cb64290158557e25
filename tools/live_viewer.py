"""Watch a running session live: the reference GUI's viewport over TCP.

Connects to the engine's control channel (app/control.py). Two modes:

- the default 2D mode switches the connection into a `stream_view` push
  stream and displays the texture viewports (color/depth/normal/label) with
  cv2.imshow (or dumps them to --outdir on a headless machine);
- `--mode cloud` polls `get_pointcloud id=-1` (the combined world-frame
  scene, objects placed at P_0 P_m^-1) and renders a slowly ORBITING 3D
  view of the live map — the reference GUI's main 3D viewport
  (MainController.cpp:717-977), with objects tintable per model (--tint).

Usage:
    python tools/live_viewer.py [--host 127.0.0.1] [--port 45455]
        [--kind color|depth|normal|label] [--hz 5] [--outdir DIR]
        [--mode view|cloud] [--tint] [--size 960x720]
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import socket
import sys
import time

_TINT = [  # per-model tints (model 0 keeps true colour)
    (255, 80, 80), (80, 255, 80), (80, 120, 255), (255, 220, 60),
    (255, 80, 255), (60, 255, 255), (255, 160, 60), (160, 80, 255),
]


def _render_cloud(rows, w, h, theta, tint):
    """Project the [N, 7] xyz+rgb+m cloud from an orbiting camera (numpy)."""
    import numpy as np

    pos, col, mid = rows[:, :3], rows[:, 3:6], rows[:, 6].astype(np.int32)
    if tint:
        for k in range(1, int(mid.max(initial=0)) + 1):
            t = np.array(_TINT[(k - 1) % len(_TINT)], np.float32)
            sel = mid == k
            col[sel] = 0.4 * col[sel] + 0.6 * t
    centre = np.median(pos, axis=0)
    r = 1.3 * float(np.percentile(
        np.linalg.norm(pos - centre, axis=1), 90
    )) + 1e-3
    # orbit in the x-z plane, slight elevation
    eye = centre + r * np.array(
        [np.sin(theta), -0.35, -np.cos(theta)], np.float32
    )
    fwd = centre - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0], np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right) + 1e-12
    upv = np.cross(right, fwd)
    pc = pos - eye
    x = pc @ right
    y = pc @ upv
    z = pc @ fwd
    ok = z > 1e-3
    f = 0.9 * min(w, h)
    u = (f * x[ok] / z[ok] + w / 2).astype(np.int32)
    v = (h / 2 - f * y[ok] / z[ok]).astype(np.int32)
    inb = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    u, v = u[inb], v[inb]
    zs = z[ok][inb]
    cs = col[ok][inb]
    order = np.argsort(-zs)  # painter's: far first
    img = np.zeros((h, w, 3), np.uint8)
    img[v[order], u[order]] = cs[order][:, ::-1].astype(np.uint8)  # BGR
    # 2x2 splat for visibility
    img[np.minimum(v[order] + 1, h - 1), u[order]] = \
        cs[order][:, ::-1].astype(np.uint8)
    img[v[order], np.minimum(u[order] + 1, w - 1)] = \
        cs[order][:, ::-1].astype(np.uint8)
    return img


def cloud_loop(args, show) -> int:
    import cv2
    import numpy as np

    w, h = (int(x) for x in args.size.split("x"))
    theta = 0.0
    n = 0
    with socket.create_connection((args.host, args.port), timeout=10) as s:
        f = s.makefile("rw")
        while True:
            f.write(json.dumps(
                {"cmd": "get_pointcloud", "id": -1,
                 "max_points": args.max_points}
            ) + "\n")
            f.flush()
            msg = json.loads(f.readline())
            if not msg.get("ok"):
                print(f"server: {msg}", file=sys.stderr)
                time.sleep(1.0 / args.hz)
                continue
            ncol = len(msg["columns"])
            rows = np.frombuffer(
                base64.b64decode(msg["data"]), np.float32
            ).reshape(-1, ncol).copy()
            if ncol == 6:  # single-model reply: no model column
                rows = np.concatenate(
                    [rows, np.zeros((rows.shape[0], 1), np.float32)], axis=1
                )
            img = _render_cloud(rows, w, h, theta, args.tint)
            theta += args.orbit_step
            n += 1
            if args.outdir:
                p = os.path.join(args.outdir, f"cloud-{n:06d}.png")
                cv2.imwrite(p, img)
                print(f"{msg['count']}/{msg['total']} points -> {p}")
            else:
                cv2.imshow("mmf-tpu live [3D map]", img)
                if cv2.waitKey(1) & 0xFF == 27:
                    break
            if args.frames and n >= args.frames:
                break
            time.sleep(max(0.0, 1.0 / args.hz))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=45455)
    ap.add_argument("--mode", default="view", choices=["view", "cloud"])
    ap.add_argument("--kind", default="color",
                    choices=["color", "depth", "normal", "label"])
    ap.add_argument("--hz", type=float, default=5.0)
    ap.add_argument("--outdir", default="",
                    help="save frames here instead of showing a window")
    ap.add_argument("--frames", type=int, default=0,
                    help="stop after N frames (0 = until ^C / server exit)")
    ap.add_argument("--tint", action="store_true",
                    help="tint object models (3D mode)")
    ap.add_argument("--size", default="960x720", help="3D viewport size")
    ap.add_argument("--max-points", type=int, default=200000)
    ap.add_argument("--orbit-step", type=float, default=0.05,
                    help="radians of orbit per rendered frame (3D mode)")
    args = ap.parse_args()

    import cv2
    import numpy as np

    show = not args.outdir
    if show and not os.environ.get("DISPLAY") and sys.platform.startswith("linux"):
        print("no DISPLAY; pass --outdir to save frames", file=sys.stderr)
        return 2
    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)

    if args.mode == "cloud":
        return cloud_loop(args, show)

    with socket.create_connection((args.host, args.port), timeout=10) as s:
        f = s.makefile("rw")
        f.write(json.dumps(
            {"cmd": "stream_view", "kind": args.kind, "hz": args.hz}
        ) + "\n")
        f.flush()
        ack = json.loads(f.readline())
        if not ack.get("ok"):
            print(f"server refused: {ack}", file=sys.stderr)
            return 1
        n = 0
        for line in f:
            msg = json.loads(line)
            if msg.get("type") != "view":
                continue
            buf = np.frombuffer(base64.b64decode(msg["png"]), np.uint8)
            img = cv2.imdecode(buf, cv2.IMREAD_UNCHANGED)
            n += 1
            if args.outdir:
                cv2.imwrite(
                    os.path.join(args.outdir,
                                 f"{args.kind}-{msg['tick']:06d}.png"),
                    img,
                )
                print(f"tick {msg['tick']} -> {args.kind}-{msg['tick']:06d}.png")
            else:
                cv2.imshow(f"mmf-tpu live [{args.kind}]", img)
                if cv2.waitKey(1) & 0xFF == 27:  # ESC
                    break
            if args.frames and n >= args.frames:
                break
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
