"""Bridge: stream a ROS bag (frames + tf ground truth) to a live engine.

The reference's live operation pairs RosNodeReader (frames over ROS
transport + tf ground truth, GUI/Tools/RosNodeReader.cpp:142-165) with the
engine's '-init tf' mode. This environment has no ROS daemon; this bridge
plays the same role over the framework's live TCP wire format (io/live.py):
it reads a recorded bag deterministically (io/rosbag.py — the same reader
'-l file.bag' uses), attaches each frame's tf pose on the v2 pose channel,
and streams to a listening engine:

    terminal 1:  python -m multimotionfusion_tpu.app.main -l live:5577 \
                     -init tf -icp_refine -run -q
    terminal 2:  python tools/rosbag_to_live.py nx_estim2_rotation.bag \
                     --port 5577 [--rate 30]

Any producer in any language can implement the same ~30-line wire format —
this file doubles as its reference implementation exercise.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--rate", type=float, default=0.0,
                    help="frames/s pacing; 0 = as fast as the socket drains")
    ap.add_argument("--dim", default="", help="WxH crop/scale, e.g. 640x480")
    ap.add_argument("--compress", action="store_true")
    args = ap.parse_args()

    from multimotionfusion_tpu.io.live import publish_frames
    from multimotionfusion_tpu.io.rosbag import RosBagReader

    dim = None
    if args.dim:
        w, h = args.dim.lower().split("x")
        dim = (int(w), int(h))
    reader = RosBagReader(args.bag, target_dimensions=dim)
    cam = reader.intrinsics()

    def frames():
        t_last = [0.0]
        for f in reader:
            # attach the bag's tf ground truth (ABSOLUTE pose; the consumer
            # re-bases to its first received pose, matching the reference's
            # relative-to-first convention)
            gt = reader.get_incremental_transformation(f.timestamp)
            if gt is not None:
                f.gt_pose = np.asarray(gt)
            if args.rate > 0:
                now = time.time()
                wait = t_last[0] + 1.0 / args.rate - now
                if wait > 0:
                    time.sleep(wait)
                t_last[0] = time.time()
            yield f

    n = publish_frames(frames(), cam, args.port, host=args.host,
                       compress=args.compress)
    print(f"streamed {n} frames from {args.bag}")


if __name__ == "__main__":
    main()
