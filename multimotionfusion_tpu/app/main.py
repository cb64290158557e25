"""Command-line app shell.

Headless counterpart of the reference executable (GUI/Main.cpp +
GUI/MainController.cpp). Flag names follow the reference CLI surface
(documented MainController.cpp:40-122) so scripted reference invocations port
directly; Pangolin GUI rendering is out of scope (the engine exposes the same
textures for an external viewer).

Usage examples:
    python -m multimotionfusion_tpu.app.main -l sequence.klg -run -q -ep -em
    python -m multimotionfusion_tpu.app.main -l synthetic -frames 60 -exportdir /tmp/out
"""

from __future__ import annotations

import argparse
import os
import sys
import time as _time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="multimotionfusion_tpu",
        description="TPU-native multi-object RGB-D SLAM",
    )
    # reference flags (MainController.cpp:40-122); single-dash as upstream
    p.add_argument("-l", dest="log", default="synthetic", help="log source: .klg | image dir | 'synthetic'")
    p.add_argument("-dim", default="640x480", help="process images at WxH")
    p.add_argument("-cal", default=None, help="calibration file 'fx fy cx cy'")
    p.add_argument("-frames", type=int, default=None, help="stop after N frames")
    p.add_argument("-init", dest="odom_init", default="kp", choices=["kp", "tf", "none"], help="pose initialisation")
    p.add_argument("-icp_refine", action="store_true", default=True)
    p.add_argument("-no_icp_refine", dest="icp_refine", action="store_false")
    p.add_argument("-static", action="store_true", help="single static model (ElasticFusion mode)")
    p.add_argument("-segm_mode", default="", help="segmentation mode ('', 'flow_crf')")
    p.add_argument("-exportdir", default=".", help="output directory")
    p.add_argument("-ep", action="store_true", help="export poses on finish")
    p.add_argument("-em", action="store_true", help="export model PLY clouds on finish")
    p.add_argument("-run", action="store_true", help="start immediately (always true, headless)")
    p.add_argument("-q", action="store_true", help="quit on finish (always true, headless)")
    p.add_argument("-v", dest="verbose", action="store_true")
    # rosbag topics (reference MainController.cpp:98-100)
    p.add_argument("-topic_colour", default="", help="ROS topic for colour images")
    p.add_argument("-topic_depth", default="", help="ROS topic for depth images")
    p.add_argument("-topic_camera_info", default="", help="ROS topic for camera info")
    p.add_argument("-frame_gt_camera", default="", help="tf frame of the ground-truth camera pose")
    p.add_argument("-rt", action="store_true",
                   help="real-time playback: drop frames when processing falls behind the log clock (MainController.cpp:614-617)")
    p.add_argument("-batch", type=int, default=1,
                   help="frames per device dispatch (static mode; amortises per-dispatch overhead)")
    p.add_argument("-ctrl", type=int, default=0,
                   help="TCP port for the JSON runtime-control server (0 = off)")
    p.add_argument("-snapshot", action="store_true",
                   help="write colour/normal/depth/label renders of the final map")
    p.add_argument("-orbit", action="store_true",
                   help="write an MP4 orbit render of the final map")
    p.add_argument("-ckpt", default="", help="resume a full-session checkpoint")
    p.add_argument("-save_ckpt", default="", help="write a full-session checkpoint on finish")
    return p


def make_config(args) -> "EngineConfig":
    import dataclasses

    from multimotionfusion_tpu.config import CameraModel, EngineConfig

    w, h = (int(v) for v in args.dim.split("x"))
    cam_kw = dict(width=w, height=h)
    if args.cal:
        with open(args.cal) as f:
            fx, fy, cx, cy = (float(v) for v in f.read().split()[:4])
        cam_kw.update(fx=fx, fy=fy, cx=cx, cy=cy)
    else:
        # reference default intrinsics scale with -dim (MainController.cpp:147-149)
        cam_kw.update(fx=528.0 * w / 640, fy=528.0 * h / 480, cx=w / 2, cy=h / 2)
    cfg = EngineConfig(
        camera=CameraModel(**cam_kw),
        odom_init="" if args.odom_init == "none" else args.odom_init,
        icp_refine=args.icp_refine,
        enable_multi_model=not args.static,
        export_dir=args.exportdir,
    )
    if args.segm_mode:
        cfg = dataclasses.replace(
            cfg,
            segmentation=dataclasses.replace(cfg.segmentation, mode=args.segm_mode),
        )
    return cfg


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = make_config(args)

    from multimotionfusion_tpu.engine import MultiMotionFusionTPU
    from multimotionfusion_tpu.io.readers import open_log

    if args.log.endswith(".bag"):
        from multimotionfusion_tpu.io.rosbag import RosBagReader

        reader = RosBagReader(
            args.log, topic_colour=args.topic_colour,
            topic_depth=args.topic_depth,
            topic_camera_info=args.topic_camera_info,
            target_dimensions=(cfg.camera.width, cfg.camera.height),
            frame_gt_camera=args.frame_gt_camera,
        )
    else:
        reader = open_log(args.log, cfg.camera)
    if reader.intrinsics() is not None:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, camera=reader.intrinsics())
    engine = MultiMotionFusionTPU(cfg)
    os.makedirs(args.exportdir, exist_ok=True)
    if args.ckpt:
        engine.load_checkpoint(args.ckpt)
        print(f"resumed session at tick {engine.tick} from {args.ckpt}")

    ctrl = None
    if args.ctrl:
        from multimotionfusion_tpu.app.control import ControlServer

        ctrl = ControlServer(engine, port=args.ctrl)
        print(f"control server on 127.0.0.1:{ctrl.port}")

    n = len(reader) if args.frames is None else min(args.frames, len(reader))
    if args.batch > 1 and args.static and not args.rt and args.odom_init != "tf":
        # offline batched path: k frames per device dispatch
        t_start = _time.time()
        frames_iter = iter(reader)
        first = next(frames_iter)
        engine.process_frame(first)
        rest = []
        for i, f in enumerate(frames_iter):
            if i + 1 >= n:
                break
            rest.append(f)
        chunks = [rest[i : i + args.batch] for i in range(0, len(rest), args.batch)]
        handle = engine.upload_batch(chunks[0]) if chunks else None
        for i, c in enumerate(chunks):
            nxt = (
                engine.upload_batch(chunks[i + 1]) if i + 1 < len(chunks) else None
            )
            engine.process_frames(handle)
            handle = nxt
            if args.verbose:
                el = _time.time() - t_start
                print(f"frame {engine.tick - 1}/{n} {(engine.tick - 1) / el:.1f} fps", flush=True)
        return _finish(engine, args, t_start)
    t_start = _time.time()
    t0_stamp = None
    skipped = 0
    # pipeline: frame i+1 uploads (background thread) while frame i computes
    it = iter(reader)
    handle = None
    processed = 0
    for i in range(n):
        if ctrl is not None:
            while ctrl.paused and not ctrl.stop_requested:
                _time.sleep(0.05)
            if ctrl.stop_requested:
                break
        if handle is None:
            try:
                handle = engine.upload(next(it))
            except StopIteration:
                break
        try:
            nxt = engine.upload(next(it)) if i + 1 < n else None
        except StopIteration:
            nxt = None
        frame = handle[0]
        # real-time frame-skip policy (reference drops frames whenever the
        # engine runs slower than the log clock, MainController.cpp:614-617)
        if args.rt and frame.timestamp:
            if t0_stamp is None:
                t0_stamp = frame.timestamp
            behind = (_time.time() - t_start) - (frame.timestamp - t0_stamp) * 1e-9
            if behind > 1.0 / 30.0 and processed > 0:
                handle = nxt
                skipped += 1
                continue
        gt = None
        if args.odom_init == "tf" and hasattr(reader, "get_incremental_transformation"):
            gt = reader.get_incremental_transformation(frame.timestamp)
        engine.process_frame(handle, gt_pose=gt)
        processed += 1
        handle = nxt
        if args.verbose or i % 30 == 0:
            stats = engine.current_stats(sync=True)
            el = _time.time() - t_start
            print(
                f"frame {i + 1}/{n} surfels={stats.get('surfels', 0)} "
                f"icp_err={stats.get('icp_error', 0):.2e} "
                f"{(i + 1) / el:.1f} fps",
                flush=True,
            )
    if skipped:
        print(f"dropped {skipped} frames to keep real-time")
    return _finish(engine, args, t_start)


def _finish(engine, args, t_start) -> int:
    engine.finish()
    wall = _time.time() - t_start
    print(f"processed {engine.tick - 1} frames in {wall:.1f}s "
          f"({(engine.tick - 1) / wall:.2f} fps)")
    if args.save_ckpt:
        print("wrote", engine.save_checkpoint(args.save_ckpt))
    if args.ep:
        for p in engine.export_poses(args.exportdir):
            print("wrote", p)
    if args.em:
        for p in engine.save_ply(args.exportdir):
            print("wrote", p)
    if args.snapshot:
        from multimotionfusion_tpu.app import viewer

        for p in viewer.snapshot(engine, args.exportdir):
            print("wrote", p)
    if args.orbit:
        from multimotionfusion_tpu.app import viewer

        print("wrote", viewer.orbit_video(
            engine, os.path.join(args.exportdir, "orbit.mp4")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
