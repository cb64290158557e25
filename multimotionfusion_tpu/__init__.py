"""MultiMotionFusion-TPU: a TPU-native (JAX/XLA/Pallas) multi-object RGB-D SLAM framework.

A from-scratch re-design of the capabilities of christian-rauch/MultiMotionFusion
(RA-L 2022, doi 10.1109/LRA.2022.3200177) for TPU hardware:

- one dense surfel map per rigid body (model 0 = static environment),
- sparse keypoint tracking (SuperPoint + track table) for pose initialisation,
- dense joint ICP + photometric Gauss-Newton odometry refinement,
- motion segmentation (flow CRF) driving model spawning / deactivation,
- fern-based loop closure and an embedded deformation graph,
- model database store/load + keypoint-based redetection.

Unlike the reference (CUDA kernels + OpenGL transform-feedback + CPU control flow),
the whole per-frame compute path here is a small set of jitted XLA programs over
fixed-capacity arrays; host Python only does frame-level orchestration.
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM geometry cannot round through bf16: TPU's DEFAULT matmul precision is
# bf16 (8 mantissa bits), which quantises pose compositions (~0.4% per 4x4
# matmul, compounding every frame), Kabsch cross-covariances, and — fatally —
# the one-hot selection matmuls whose outputs are surfel IDS (bf16 has ~2.3k
# representable values below 2^17; 97% of fusion merges were silently
# misdirected before this was pinned, see model/fusion.py). Hot kernels that
# can tolerate reduced precision opt back in with explicit bf16 dtypes
# (odometry/rgbd.py tap banks), which this flag does not affect.
_jax.config.update("jax_default_matmul_precision", "highest")

from multimotionfusion_tpu.config import CameraModel, EngineConfig, OdometryConfig
