"""Static configuration for the whole framework.

The reference spreads configuration over three tiers (CLI flags, Pangolin GUI vars
pushed every frame, ROS services — see reference GUI/MainController.cpp:40-122,
Core/Model/Model.h:45-61, Core/Segmentation/Segmentation.h:72-80). Here everything
is a frozen dataclass so configs can be closed over by jitted functions as static
values; runtime-mutable knobs live on the engine object and are passed as traced
scalars where they must change without recompilation.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class CameraModel:
    """Pinhole camera model (reference Core/Utils/Intrinsics.h + Resolution.h).

    Unlike the reference's global singletons, this is an explicit value threaded
    through the pipeline. `level(i)` mirrors `CameraModel operator()(int)` used by
    the CUDA pyramid code: intrinsics halve per level.
    """

    width: int = 640
    height: int = 480
    fx: float = 528.0
    fy: float = 528.0
    cx: float = 320.0
    cy: float = 240.0

    def level(self, i: int) -> "CameraModel":
        div = 1 << i
        return CameraModel(
            width=self.width >> i,
            height=self.height >> i,
            fx=self.fx / div,
            fy=self.fy / div,
            cx=self.cx / div,
            cy=self.cy / div,
        )

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.height, self.width)


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    """Dense RGBD odometry schedule (reference Core/Utils/RGBDOdometry.{h,cpp}).

    iterations follow RGBDOdometry.cpp:312-314: {10,5,4} coarse->fine, or {3,0,0}
    with fast_odom. Thresholds follow the reference defaults
    (Model.cpp: icpStep distThres=0.10m, angleThres=sin(20 deg)).
    """

    num_pyr: int = 3
    iterations: Tuple[int, ...] = (10, 5, 4)  # level 0 (fine) .. level 2 (coarse)
    so3_iterations: int = 10
    fast_odom: bool = False
    pyramid: bool = True
    rgb_only: bool = False
    icp_weight: float = 10.0
    so3_prealign: bool = True
    dist_thresh: float = 0.10  # m, ICP correspondence gate
    angle_thresh: float = 0.342020143  # sin(20 deg), normal agreement gate
    max_depth_delta_rgb: float = 0.07  # m, photometric correspondence gate
    max_depth_rgb: float = 6.0  # m
    sobel_scale: float = 1.0 / 8.0  # 1/2^sobelSize, sobelSize=3
    # minimum gradient magnitude per level (intensity units), RGBDOdometry.cpp:103-105
    min_grad_magnitudes: Tuple[float, ...] = (5.0, 3.0, 1.0)
    divergence_trans_norm: float = 0.3  # m; reject update if ||dt|| larger
    mask_icp: bool = True  # per-model masking of the frame vmap (maskID semantics)
    mask_rgb: bool = True  # MASK_RGB_RESIDUAL semantics
    # Keypoint tracker pyramid levels (reference Model.h:54,60 OdometryConfig
    # init_lvl/segm_lvl; '-lvl_init'/'-lvl_segm', MainController.cpp:182-183).
    # The reference keeps a SEPARATE PointTracker per used level
    # (MultiMotionFusion.cpp:83-87): keypoint pose init reads
    # tracker[init_lvl] (:287), segmentation velocities read
    # tracker[segm_lvl] (:148). Coarser levels give longer-lived tracks
    # under fast motion (detection on the downsampled image). When equal
    # (the reference default: both 0) one table serves both consumers.
    init_lvl: int = 0
    segm_lvl: int = 0
    # GN early-exit: stop a level once the applied step is below this norm in
    # BOTH translation (m) and rotation (rad). Pure performance — remaining
    # iterations move the pose by ~0.1 mm / 0.1 mrad — below the mm-scale
    # accuracy floor of the sensor model, and comparable to the numerical
    # noise floor of the f32 normal equations themselves (steps below ~1e-4
    # are solver noise, so waiting for 2e-5 just burned the full budget).
    # The reference always runs all iterations (no analogue).
    convergence_eps: float = 1e-4
    # Evaluate the level-0 GN systems on a stride-N pixel grid (1 = every
    # pixel, like the reference). At 640x480 the full-res grid gives ~3e5
    # residual rows for 6 unknowns; stride 2 keeps ~7.6e4 rows (still vastly
    # overdetermined; measured ATE impact on the synthetic suite is at the
    # run-to-run noise floor) and cuts the per-iteration warp gather — the
    # single hottest op of the whole frame — by ~4x. The sampling bank and
    # warp stay full-resolution, so no detail is lost to pre-filtering.
    fine_subsample: int = 2
    # Same idea one level up (OFF by default): evaluate the level-1 GN
    # systems on a stride-2 grid. Measured on TPU this is a net LOSS at
    # default schedules — the coarser level-1 solve hands level 0 a worse
    # start and the finest level burns its full iteration budget (10 vs ~6),
    # costing more than the level-1 rows saved. Kept as a knob for
    # fast-odom-style configurations.
    mid_subsample: int = 1
    # Produce full-resolution per-pixel ICP/RGB error images at the final
    # pose (one extra full-res evaluation). Only the legacy CoFusion CRF
    # consumes them (Segmentation.cpp:212-332); off by default.
    error_images: bool = False

    def schedule(self) -> Tuple[int, ...]:
        if self.fast_odom:
            return (3, 0, 0)
        if not self.pyramid:
            return (self.iterations[0], 0, 0)
        return self.iterations


@dataclasses.dataclass(frozen=True)
class SurfelConfig:
    """Surfel map capacities and fusion thresholds.

    The reference caps each model at TEXTURE_DIMENSION^2 = 1024^2 surfels
    (Core/Model/Model.cpp:116-126). We use an explicit capacity; the engine grows
    through power-of-two buckets so jit caches stay warm while small maps stay fast.
    """

    max_surfels: int = 1 << 20
    depth_cutoff: float = 3.0
    conf_threshold: float = 10.0
    # object models render/clean at a much lower confidence gate than the
    # global scene — they are young and small ('-confO' default 0.01 vs
    # '-confG' 10.0, MainController.cpp:77-78)
    object_conf_threshold: float = 0.01
    time_delta: int = 200
    # data association window (data.vert windowMultiplier=2 -> 4x4 neighbourhood)
    assoc_window: int = 4
    assoc_depth_gate: float = 0.05  # |zdiff*lambda| gate, data.vert
    # splat footprint cap in pixels (GL point sprites are dynamically sized;
    # we bound the footprint statically for fixed shapes). 5 covers radii at
    # the working depth range; each +2 adds ~1.5x resolve-stencil cost
    splat_footprint: int = 5
    outlier_coeff: float = 4.0
    unstable_grace: int = 20  # frames an unstable surfel has to reach confThreshold
    clean_see_through_gate: float = 0.03  # m, copy_unstable.vert "violation" gate
    # Repack surviving surfels to the front every N frames (0 = never, 1 =
    # every frame like the reference's per-frame transform-feedback repack,
    # copy_unstable.geom). The repack is a [CHANNELS, bucket] scatter —
    # ~19 ms at a 393k bucket on TPU v5e, vs ~5 ms for the flag-clear cull —
    # so amortising it over N frames buys most of the bounded-bucket benefit
    # at 1/N of the cost; between repacks culled surfels just lose their
    # ALIVE flag and the high-water mark carries ~N*append_rate transient.
    compact_every: int = 8


@dataclasses.dataclass(frozen=True)
class KeypointConfig:
    """Sparse keypoint pipeline (SuperPoint + track table).

    Track-table semantics follow reference Core/Utils/PointTracker.{hpp,cpp}:
    fixed-capacity rows = tracks, columns = time steps (ring buffer), masks for
    validity; descriptor matching is mutual-NN L2 with a distance gate.
    """

    max_keypoints: int = 512
    max_tracks: int = 4096
    track_history: int = 32  # ring-buffer length per track
    match_dist_gate: float = 0.7
    prune_min_kps: int = 30
    prune_max_age_s: float = 1.0
    detect_threshold: float = 0.015
    nms_radius: int = 4
    # "superpoint" needs weights_path (TorchScript SuperPointNet.pt, the
    # reference's model); "patch" is the weights-free fallback detector
    detector: str = "patch"
    weights_path: str = ""

    @property
    def desc_dim(self) -> int:
        return 256 if self.detector == "superpoint" else 64

    @property
    def patch_gate(self) -> float:
        """Distance gate adjusted per descriptor family: SuperPoint's 0.7 is
        tuned for unit 256-d descriptors; zero-mean unit patches discriminate
        at a larger radius."""
        return self.match_dist_gate if self.detector == "superpoint" else 1.0


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """Rigid RANSAC (reference Core/Utils/RigidRANSAC.h:10-20)."""

    iterations: int = 200
    inlier_threshold: float = 0.01  # m
    inlier_fraction: float = 0.5


# Redetection uses a LOOSER fit than frame-to-frame seeding (reference
# MultiMotionFusion.cpp:513: iterations=10, inlier_threshold=0.03,
# fraction=0.8): stored-view depth and the new view differ by quantisation
# and viewpoint. Fraction stays 0.5 here — the 0.8 gate assumes SuperPoint
# match purity; iterations are free on TPU (all candidates run in parallel).
# Redetection RANSAC (reference MultiMotionFusion.cpp:513: iterations=10,
# inlier_threshold=0.03, inlier_fraction=0.8). The reference's 0.8 fraction
# gate assumes SuperPoint-grade matches; the weights-free patch descriptor
# produces noisier match sets where a hard fraction gate rejects candidates
# that the ABSOLUTE acceptance (inliers > 5 and tightened refit err < 0.01,
# engine_multi.redetect_one) would correctly keep. More parallel iterations
# compensate for the lower per-candidate bar.
REDETECT_RANSAC = RansacConfig(
    iterations=64, inlier_threshold=0.03, inlier_fraction=0.25
)


@dataclasses.dataclass(frozen=True)
class SegmentationConfig:
    """Flow-CRF motion segmentation (reference Core/Segmentation/Segmentation.{h,cpp})."""

    mode: str = "flow_crf"  # "flow_crf" | "precomputed" | "none"
    scale: float = 0.25  # CRF working scale, Segmentation.cpp:768-773
    crf_iterations: int = 10
    max_models: int = 16
    # flow-CRF knobs (Segmentation.cpp:742-1347)
    sigma_depth: float = 0.03
    velocity_threshold: float = 20.0  # px/s sparse unary gate
    flow_ramp_lo: float = 0.2
    flow_ramp_hi: float = 5.0
    new_label_min_frac: float = 0.05
    # Minimum posterior a non-global row needs to claim a pixel; below it the
    # pixel defaults to the global model. CRF smoothness floods a weak
    # (~q*ramp < 0.2) copy of an object's label over adjacent texture-less /
    # track-less regions; without this floor those flooded claims win pixels
    # no model actually explains, and fusion then feeds background into
    # object maps (phantom models). 0.25 sits above the flood level but
    # below a slow (2 px/frame) mover's flow claim (ramp ~0.37 x q) and far
    # below any reprojection fit (p ~ 1). The reference's normalised rows +
    # global-first tie-break suppress the same flood implicitly
    # (Segmentation.cpp:1174-1246).
    min_claim_prob: float = 0.25
    # reference defaults: weightSmoothness=40, weightAppearance=40
    # (Core/Segmentation/Segmentation.h:147-148); the Gaussian kernel gets
    # 4x the smoothness weight (Segmentation.cpp:1132)
    pairwise_gaussian_sigma: float = 3.0
    pairwise_gaussian_weight: float = 40.0
    pairwise_flow_sigma_xy: float = 40.0
    pairwise_flow_sigma_v: float = 1.0
    pairwise_flow_weight: float = 40.0
    # legacy CRF knobs
    min_rel_size_new: float = 0.07
    max_rel_size_new: float = 0.4
    # precomputed (external mask) mode: minimum area in pixels for a NEW
    # external id to spawn a model (Segmentation.cpp:115-139)
    min_mask_size_px: int = 100


@dataclasses.dataclass(frozen=True)
class FernConfig:
    """Fern keyframe database (reference Core/Ferns.{h,cpp})."""

    num_ferns: int = 500
    factor: int = 8  # downsample divisor
    max_depth: float = 7.0
    # keyframe insertion dissimilarity gate ('-ft', MainController default)
    encoding_threshold: float = 0.3095
    # relocalisation photometric verification gate ('-pt', Ferns.cpp:238)
    photo_thresh: float = 115.0


@dataclasses.dataclass(frozen=True)
class DeformationConfig:
    """Embedded deformation graph (reference Core/Utils/DeformationGraph.{h,cpp}).

    max_nodes: the reference allows up to 1024 (Model.cpp:123-124) with a
    sparse CHOLMOD solve; the TPU build solves the DENSE [12N x 12N] normal
    system on the MXU, which is exact and fast at 256 nodes (3072^2 Cholesky)
    but scales cubically — 256 nodes at ~0.1-1 m spacing covers the map
    scales this system targets (a room-scale scan).
    """

    max_nodes: int = 256
    k_neighbours: int = 4
    w_rot: float = 1.0
    w_reg: float = 10.0
    w_con: float = 100.0
    iterations: int = 3


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Top-level engine configuration (reference Core/MultiMotionFusion.h:54-60 ctor args)."""

    camera: CameraModel = CameraModel()
    odometry: OdometryConfig = OdometryConfig()
    surfels: SurfelConfig = SurfelConfig()
    keypoints: KeypointConfig = KeypointConfig()
    ransac: RansacConfig = RansacConfig()
    segmentation: SegmentationConfig = SegmentationConfig()
    ferns: FernConfig = FernConfig()
    deformation: DeformationConfig = DeformationConfig()

    # multi-model capacities: object models live in fixed device-resident
    # slots (spawn/deactivate flips an active flag — no recompilation, unlike
    # growing the reference's model list); the reference allows up to 256
    # models with 1024^2 surfels each, bounded only by GPU memory. Default 5
    # slots = the BASELINE.md north-star config (>= 5 simultaneous objects).
    object_slots: int = 5
    object_capacity: int = 1 << 16

    # pipeline switches (reference CLI flags, MainController.cpp:40-122)
    odom_init: str = "kp"  # "kp" | "tf" | "" (pose initialisation source)
    icp_refine: bool = True
    enable_multi_model: bool = True  # False ~ "-static" ElasticFusion mode
    enable_redetection: bool = False
    enable_model_spawning: bool = True
    close_loops: bool = False
    # post-deformation mean constraint error (m) below which a loop closure
    # is applied to the map (Deformation.cpp:135 accept gates; see
    # model/loop_closure.py for the unit translation)
    loop_accept_cons_err: float = 0.02
    reloc_mode: bool = False
    frame_to_frame_rgb: bool = False
    # send depth over the host->device link as uint16 millimetres WHEN the
    # reader already provides u16 (the raw unit of every supported sensor /
    # log format); f32 depth is sent as-is — converting it on the host costs
    # ~2 ms/frame of CPU for ~1 ms of transfer saved (measured: the tunnel
    # moves ~1 GB/s, so host-side repacking is the bottleneck, not bytes)
    upload_depth_mm: bool = True
    # send colour as Y + half-res chroma (Y = the engine's exact intensity,
    # so tracking is lossless; map colours get half-res chroma). OFF by
    # default: the ~10 ms/frame of host numpy packing costs far more than
    # the ~0.5 ms of transfer it saves (same measurement as above); the
    # format remains for genuinely thin links
    upload_yuv420: bool = False
    model_spawn_offset: int = 22  # spawn cool-down in frames (reference default)
    # frames with zero segment pixels before an object is deactivated; the
    # reference deactivates after ONE unseen frame (MultiMotionFusion.cpp:
    # 606-613) which thrashes on marginal segmentations — 3 is more stable
    model_unseen_patience: int = 3
    max_models: int = 256  # uint8 mask ids, MultiMotionFusion.cpp:983-999
    min_inactive_surfels: int = 500  # keep-on-deactivate gate
    export_dir: str = "."
    seed: int = 0
