"""Watch a running session live: the reference GUI's viewport over TCP.

Connects to the engine's control channel (app/control.py), switches the
connection into a `stream_view` push stream and displays the frames with
cv2.imshow (or dumps them to --outdir on a headless machine).

Usage:
    python tools/live_viewer.py [--host 127.0.0.1] [--port 45455]
        [--kind color|depth|normal|label] [--hz 5] [--outdir DIR]
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import socket
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=45455)
    ap.add_argument("--kind", default="color",
                    choices=["color", "depth", "normal", "label"])
    ap.add_argument("--hz", type=float, default=5.0)
    ap.add_argument("--outdir", default="",
                    help="save frames here instead of showing a window")
    ap.add_argument("--frames", type=int, default=0,
                    help="stop after N frames (0 = until ^C / server exit)")
    args = ap.parse_args()

    import cv2
    import numpy as np

    show = not args.outdir
    if show and not os.environ.get("DISPLAY") and sys.platform.startswith("linux"):
        print("no DISPLAY; pass --outdir to save frames", file=sys.stderr)
        return 2
    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)

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
