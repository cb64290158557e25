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
    p.add_argument("-l", dest="log", default="synthetic", help="log source: .klg | .bag | image dir | 'synthetic'")
    p.add_argument("-dir", dest="image_dir", default="", help="image-directory log (Color####.png + Depth####.exr [+ Mask####.png])")
    p.add_argument("-basedir", default="", help="treat -dir/-depthdir/-maskdir relative to this")
    p.add_argument("-depthdir", default="", help="separate depth directory (==dir if not provided)")
    p.add_argument("-maskdir", default="", help="separate mask directory (==dir if not provided)")
    p.add_argument("-colorprefix", default="Color")
    p.add_argument("-depthprefix", default="Depth")
    p.add_argument("-maskprefix", default="Mask")
    p.add_argument("-nm", type=int, default=None, help="ignore Mask images from this frame on")
    p.add_argument("-dim", default="640x480", help="process images at WxH")
    p.add_argument("-cal", default=None, help="calibration file 'fx fy cx cy'")
    p.add_argument("-frames", type=int, default=None, help="stop after N frames")
    p.add_argument("-s", dest="skip_start", type=int, default=0, help="frames to skip at start of log")
    p.add_argument("-e", dest="end_frame", type=int, default=None, help="cut-off frame of log")
    p.add_argument("-skip", dest="skip_interval", type=int, default=1, help="take every Nth frame")
    p.add_argument("-f", dest="flip_rgb", action="store_true", help="flip RGB/BGR")
    p.add_argument("-p", dest="gt_poses", default="", help="TUM ground-truth trajectory file (used by '-init tf')")
    p.add_argument("-init", dest="odom_init", default="kp", choices=["kp", "tf", "none"], help="pose initialisation")
    p.add_argument("-icp_refine", action="store_true", default=True)
    p.add_argument("-no_icp_refine", dest="icp_refine", action="store_false")
    p.add_argument("-static", action="store_true", help="single static model (ElasticFusion mode)")
    p.add_argument("-segm_mode", default="", help="segmentation mode ('', 'flow_crf', 'crf', 'precomputed')")
    p.add_argument("-d", dest="depth_cutoff", type=float, default=None, help="depth cutoff distance (m)")
    p.add_argument("-i", dest="icp_weight", type=float, default=None, help="relative ICP/RGB tracking weight")
    p.add_argument("-or", dest="outlier_coeff", type=float, default=None, help="outlier rejection strength")
    p.add_argument("-t", dest="time_delta", type=int, default=None, help="time window length")
    p.add_argument("-o", dest="open_loop", action="store_true", help="open loop mode (infinite time window)")
    p.add_argument("-rl", dest="reloc", action="store_true", help="enable relocalisation")
    p.add_argument("-cl", dest="close_loops", action="store_true", help="enable global loop closure deformation")
    p.add_argument("-fo", dest="fast_odom", action="store_true", help="fast odometry (single level pyramid)")
    p.add_argument("-lvl_init", dest="lvl_init", type=int, default=None, help="keypoint tracker pyramid level for pose init (reference -lvl_init)")
    p.add_argument("-lvl_segm", dest="lvl_segm", type=int, default=None, help="keypoint tracker pyramid level for segmentation (reference -lvl_segm)")
    p.add_argument("-nso", dest="no_so3", action="store_true", help="disable SO(3) pre-alignment")
    p.add_argument("-ftf", dest="frame_to_frame", action="store_true", help="frame-to-frame RGB tracking")
    p.add_argument("-ft", dest="fern_thresh", type=float, default=None, help="fern encoding threshold")
    p.add_argument("-pt", dest="photo_thresh", type=float, default=None, help="relocalisation photometric threshold")
    p.add_argument("-fs", dest="rt_alias", action="store_true", help="frame skip to simulate real-time (== -rt)")
    p.add_argument("-redetection", action="store_true", help="re-detect previously modelled objects")
    p.add_argument("-restore", nargs="?", const="/tmp/model_db", default="", help="load stored models as redetection candidates")
    p.add_argument("-model", dest="sp_weights", default="", help="TorchScript SuperPoint weights for keypoint prediction")
    p.add_argument("-confO", dest="conf_object", type=float, default=None, help="object surfel confidence threshold")
    p.add_argument("-confG", dest="conf_global", type=float, default=None, help="global surfel confidence threshold")
    p.add_argument("-segMinNew", type=float, default=None, help="min relative size of new object segments")
    p.add_argument("-segMaxNew", type=float, default=None, help="max relative size of new object segments")
    p.add_argument("-offset", dest="spawn_offset", type=int, default=None, help="frames between model spawns")
    p.add_argument("-keep", action="store_true", help="keep all models (even small deactivated ones)")
    p.add_argument("-a", dest="preallocate", type=int, default=None, help="preallocate object model slots")
    p.add_argument("-exportdir", default=".", help="output directory")
    p.add_argument("-ep", action="store_true", help="export poses on finish")
    p.add_argument("-em", action="store_true", help="export model PLY clouds on finish")
    p.add_argument("-es", action="store_true", help="export per-frame segmentation images")
    p.add_argument("-ev", action="store_true", help="export viewport (colour) render of the final map")
    p.add_argument("-el", action="store_true", help="export label render of the final map")
    p.add_argument("-en", action="store_true", help="export normal render of the final map")
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
        reloc_mode=args.reloc,
        close_loops=args.close_loops,
        enable_redetection=args.redetection,
        frame_to_frame_rgb=args.frame_to_frame,
    )
    if args.segm_mode:
        cfg = dataclasses.replace(
            cfg,
            segmentation=dataclasses.replace(cfg.segmentation, mode=args.segm_mode),
        )

    def upd(field, **kw):
        kw = {k: v for k, v in kw.items() if v is not None}
        if not kw:
            return cfg
        return dataclasses.replace(
            cfg, **{field: dataclasses.replace(getattr(cfg, field), **kw)}
        )

    cfg = upd(
        "surfels",
        depth_cutoff=args.depth_cutoff,
        outlier_coeff=args.outlier_coeff,
        time_delta=(2**30 if args.open_loop else args.time_delta),
        conf_threshold=args.conf_global,
        object_conf_threshold=args.conf_object,
    )
    cfg = upd(
        "odometry",
        icp_weight=args.icp_weight,
        fast_odom=True if args.fast_odom else None,
        so3_prealign=False if args.no_so3 else None,
        init_lvl=args.lvl_init,
        segm_lvl=args.lvl_segm,
    )
    cfg = upd(
        "ferns",
        encoding_threshold=args.fern_thresh,
        photo_thresh=args.photo_thresh,
    )
    cfg = upd(
        "segmentation",
        min_rel_size_new=args.segMinNew,
        max_rel_size_new=args.segMaxNew,
    )
    if args.sp_weights:
        cfg = upd(
            "keypoints", detector="superpoint", weights_path=args.sp_weights
        )
    kw = {}
    if args.spawn_offset is not None:
        kw["model_spawn_offset"] = args.spawn_offset
    if args.keep:
        kw["min_inactive_surfels"] = 0
    if args.preallocate:
        kw["object_slots"] = max(args.preallocate, cfg.object_slots)
    if kw:
        cfg = dataclasses.replace(cfg, **kw)
    return cfg


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = make_config(args)

    from multimotionfusion_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from multimotionfusion_tpu.engine import MultiMotionFusionTPU
    from multimotionfusion_tpu.io.readers import (
        ImageLogReader,
        KlgLogReader,
        open_log,
    )

    if args.rt_alias:
        args.rt = True
    if args.image_dir or args.basedir:
        base = args.basedir or "."
        d = os.path.join(base, args.image_dir) if args.image_dir else base
        reader = ImageLogReader(
            d,
            color_prefix=args.colorprefix,
            depth_prefix=args.depthprefix,
            mask_prefix=args.maskprefix,
            depth_dir=os.path.join(base, args.depthdir) if args.depthdir else None,
            mask_dir=os.path.join(base, args.maskdir) if args.maskdir else None,
            mask_stop_frame=args.nm,
        )
    elif args.log.endswith(".bag"):
        from multimotionfusion_tpu.io.rosbag import RosBagReader

        reader = RosBagReader(
            args.log, topic_colour=args.topic_colour,
            topic_depth=args.topic_depth,
            topic_camera_info=args.topic_camera_info,
            target_dimensions=(cfg.camera.width, cfg.camera.height),
            frame_gt_camera=args.frame_gt_camera,
        )
    elif args.log.endswith(".klg"):
        reader = KlgLogReader(
            args.log, cfg.camera.width, cfg.camera.height,
            flip_colors=not args.flip_rgb,
        )
    else:
        reader = open_log(args.log, cfg.camera)
    if args.skip_start or args.end_frame is not None or args.skip_interval > 1:
        from multimotionfusion_tpu.io.readers import SlicedLogReader

        reader = SlicedLogReader(
            reader, args.skip_start, args.end_frame, args.skip_interval
        )
    # decode ahead of the engine on a background thread (the reference's
    # ImageLogReader buffering thread); live/synthetic sources don't decode
    if (args.image_dir or args.basedir
            or args.log.endswith((".bag", ".klg"))
            or args.log.startswith("video:")):
        from multimotionfusion_tpu.io.readers import PrefetchReader

        reader = PrefetchReader(reader)

    gt_odom = None
    if args.gt_poses:
        from multimotionfusion_tpu.io.ground_truth import GroundTruthOdometry

        gt_odom = GroundTruthOdometry(args.gt_poses)
        print(f"loaded {len(gt_odom.poses)} ground-truth poses from {args.gt_poses}")
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

    n_len = len(reader)
    if n_len == 0:  # live source: unbounded unless -frames caps it
        n = args.frames if args.frames is not None else (1 << 31)
    else:
        n = n_len if args.frames is None else min(args.frames, n_len)
    batch_ok = args.static or (
        # multi-model batching: the whole lifecycle is in-graph, so batches
        # only exclude modes that need per-frame host input (external masks)
        args.segm_mode != "precomputed"
    )
    if args.batch > 1 and batch_ok and not args.rt and args.odom_init != "tf":
        # offline batched path: k frames per device dispatch
        t_start = _time.time()
        frames_iter = iter(reader)
        first = next(frames_iter)
        engine.process_frame(first)

        def chunk_iter():
            # decode lazily, one batch ahead of the device (a 640x480 frame is
            # ~2 MB decoded; materialising a whole log up front risks host OOM)
            budget = n - 1
            buf = []
            for f in frames_iter:
                if budget <= 0:
                    break
                buf.append(f)
                budget -= 1
                if len(buf) == args.batch:
                    yield buf
                    buf = []
            if buf:
                yield buf

        chunks = chunk_iter()
        handle = None
        try:
            handle = engine.upload_batch(next(chunks))
        except StopIteration:
            pass
        while handle is not None:
            try:
                nxt = engine.upload_batch(next(chunks))
            except StopIteration:
                nxt = None
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
            ctrl.apply_pending()
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
        if args.odom_init == "tf":
            # '-p' TUM trajectory takes precedence over reader-provided tf GT
            if gt_odom is not None:
                gt = gt_odom.get_incremental_transformation(frame.timestamp)
            elif hasattr(reader, "get_incremental_transformation"):
                gt = reader.get_incremental_transformation(frame.timestamp)
        engine.process_frame(handle, gt_pose=gt)
        processed += 1
        if processed == 1 and args.restore:
            if engine.mstate is not None:
                k = engine.restore_models(args.restore)
                print(f"restored {k} stored models from {args.restore}")
        if args.es and engine.last_mask is not None:
            import cv2

            cv2.imwrite(
                os.path.join(args.exportdir, f"Segmentation{i:04d}.png"),
                (np.asarray(engine.last_mask) * 40 % 256).astype(np.uint8),
            )
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
    if args.snapshot or args.ev or args.el or args.en:
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
