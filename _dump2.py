import re
import jax, jax.numpy as jnp
from multimotionfusion_tpu.config import CameraModel, EngineConfig, SurfelConfig
from multimotionfusion_tpu import engine as eng
from multimotionfusion_tpu.io.readers import SyntheticLogReader

cam = CameraModel()
cfg = EngineConfig(camera=cam, enable_multi_model=False, odom_init="",
                   surfels=SurfelConfig(max_surfels=1 << 20))
frames = list(SyntheticLogReader(cam, num_frames=3))
engine = eng.MultiMotionFusionTPU(cfg)
engine.process_frame(frames[0])
state = engine.state
rgb_u8, depth_raw = jax.device_put((frames[1].rgb, frames[1].depth))
mask = jnp.zeros((cam.height, cam.width), jnp.int32)
lowered = eng._frame_step.lower(
    state, rgb_u8, depth_raw, mask, 2, 1.0, engine.sp_params,
    cam=cam, cfg=cfg, bucket_fuse=393216, bucket_pred=393216)
txt = lowered.compile().as_text()
open("/tmp/hlo2.txt","w").write(txt)
# find gathers with [76800] output
for m in re.finditer(r'%\S+ = \S*76800\S* gather\([^\n]*', txt):
    line = m.group(0)
    meta = re.search(r'op_name="([^"]*)"', line)
    print((meta.group(1) if meta else "?")[:150])
