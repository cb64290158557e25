import os, sys, glob, gzip, json, collections
import jax, jax.numpy as jnp
from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
from multimotionfusion_tpu.engine import MultiMotionFusionTPU
from multimotionfusion_tpu.io.readers import SyntheticLogReader

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace2"
cam = CameraModel()
cfg = EngineConfig(camera=cam, enable_multi_model=False, odom_init="",
                   surfels=SurfelConfig(max_surfels=1 << 20))
frames = list(SyntheticLogReader(cam, num_frames=12, cam_step=(0.004, 0.0, 0.0),
                                 cam_rot_step=(0.0, 0.002, 0.0)))
engine = MultiMotionFusionTPU(cfg)
for f in frames[:8]:
    engine.process_frame(f)
engine.finish()
os.makedirs(outdir, exist_ok=True)
with jax.profiler.trace(outdir):
    for f in frames[8:]:
        engine.process_frame(f)
    engine.finish()

tracefile = sorted(glob.glob(outdir + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(tracefile) as f:
    tr = json.load(f)
ev = tr["traceEvents"]
pids = {e["pid"]: e["args"].get("name", "") for e in ev if e.get("ph") == "M" and e.get("name") == "process_name"}
agg = collections.Counter()
cnt = collections.Counter()
nframes = 4
for e in ev:
    if e.get("ph") == "X" and pids.get(e.get("pid")) == "/device:TPU:0":
        a = e.get("args") or {}
        nm = a.get("long_name") or e["name"]
        if e["name"].startswith("jit__frame_step"):
            agg[("TOTAL jit__frame_step", "")] += e.get("dur", 0)
            cnt[("TOTAL jit__frame_step", "")] += 1
            continue
        agg[(e["name"], nm[:150])] += e.get("dur", 0)
        cnt[(e["name"], nm[:150])] += 1
for (k, nm), d in agg.most_common(26):
    print(f"{d/1e3/nframes:8.2f} ms/f x{cnt[(k,nm)]:3d} {k:16s} {nm[:130]}")
