"""Typed configuration for the whole framework.

Replaces the reference's pair of constant modules (`mv3d/config.py:1-46`,
`mv3d/eval/config.py:1-38`) with frozen dataclasses that can be overlaid from
YAML/CLI.  All reference hyperparameters are reproduced as defaults.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class DepthConfig:
    """Plane-sweep depth hypothesis space (reference `mv3d/config.py:26-37`)."""

    depth_start: float = 0.5
    depth_interval: float = 0.05
    n_intervals: int = 96
    size: Tuple[int, int] = (56, 56)  # (h, w) of the coarse depth map

    @property
    def depth_end(self) -> float:
        return self.depth_start + self.depth_interval * (self.n_intervals - 1)


@dataclass(frozen=True)
class GridConfig:
    """Static-shape budget for the scene feature volume.

    The reference crops the scene bbox dynamically (Minkowski sparse tensors,
    `mv3d/utils.py:38-64`); XLA needs static shapes, so we fix a per-scene
    grid capacity and a max anchor (active voxel) count.  Points outside the
    cropped grid are masked out.
    """

    edge_len: float = 0.08           # voxel edge in meters (`GRID_EDGE_LEN`)
    grid_size: Tuple[int, int, int] = (64, 64, 64)   # cells per scene (x, y, z)
    max_anchors: int = 16384         # compact active-voxel capacity
    levels: int = 3                  # U-Net scales (strides 1, 2, 4)

    @property
    def n_cells(self) -> int:
        gx, gy, gz = self.grid_size
        return gx * gy * gz


@dataclass(frozen=True)
class ModelConfig:
    feat_dim: int = 32               # image feature dim (`IMG_FEAT_DIM`)
    img_size: Tuple[int, int] = (256, 320)
    hyp_ksize: int = 3               # hypothesis conv kernel size
    unet_dims: Tuple[int, int, int] = (64, 128, 128)   # 2*feat, 128, 128
    unet_groups: Tuple[int, int, int] = (4, 8, 8)
    unet_res: Tuple[int, int, int] = (1, 2, 3)
    cost_base_channels: int = 8      # CostRegNet base channels
    decoder_hidden: int = 128
    propagation_hidden: int = 32
    depth_train: DepthConfig = field(default_factory=DepthConfig)
    depth_test: DepthConfig = field(default_factory=DepthConfig)
    grid: GridConfig = field(default_factory=GridConfig)
    # compute dtype for convs/matmuls; accumulation & variance stay fp32
    dtype: Any = jnp.float32
    # plane-sweep warp: "matmul" = two-pass homography resampling on the
    # MXU (tdvnet/ops/warp.py, ~4.3x the gather path on v5e); "gather" =
    # quad-packed bilinear gathers (exact grid_sample semantics); "auto" =
    # matmul with a runtime fallback to gather when the max scanline slope
    # |alpha| exceeds warp_alpha_max (rotation-heavy view pairs)
    warp_mode: str = "auto"
    warp_alpha_max: float = 0.25
    # 3D-conv lowering for CostRegNet + SceneUNet: "xla" = native XLA
    # conv_general_dilated; "im2col" = patch-concat + matmul
    # (tdvnet/ops/conv3d.py) — exact same math, far better MXU/HBM
    # behavior for the small-channel CostRegNet levels
    conv3d_impl: str = "xla"

    @property
    def n_hyp(self) -> int:
        return 7  # 2*3+1 hypotheses per pixel (reference n=3)


@dataclass(frozen=True)
class BatchConfig:
    """Static-shape budget for a collated batch."""

    n_scenes: int = 2                # scenes per batch (`BATCH_SIZE`)
    n_ref: int = 7                   # ref views per scene (`N_REF_IMGS`)
    n_src_on_either_side: int = 1
    img_size: Tuple[int, int] = (256, 320)
    depth_img_size: Tuple[int, int] = (256, 320)  # GT depth resolution kept

    @property
    def n_views(self) -> int:
        """Images per scene: refs plus flanking sources."""
        return self.n_ref + 2 * self.n_src_on_either_side

    @property
    def n_imgs(self) -> int:
        return self.n_scenes * self.n_views

    @property
    def n_refs_total(self) -> int:
        return self.n_scenes * self.n_ref

    @property
    def n_src(self) -> int:
        """Source slots per ref view (window incl. the ref itself)."""
        return 2 * self.n_src_on_either_side + 1


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-3
    lr_step: int = 100               # epochs between decays (StepLR)
    lr_gamma: float = 0.1
    finetune: bool = False
    finetune_lr: float = 1e-4
    finetune_lr_step: int = 50
    finetune_lr_gamma: float = 0.5
    offsets: Tuple[float, float, float] = (0.05, 0.05, 0.025)
    n_iters_early: int = 1           # refinement iters before epoch 20
    n_iters_late: int = 2
    iters_switch_epoch: int = 20
    lambda_ramp_epochs: int = 10     # λ = min(epoch, 10) * 0.1 unless finetune
    seed: int = 0
    log_every: int = 50
    ckpt_every_epochs: int = 1
    use_tensorboard: bool = True
    # TPU memory/throughput knobs (SURVEY §7.2 step 6: bf16 by default on
    # TPU; remat trades FLOPs for activation memory)
    bf16_compute: bool = False       # compute dtype bf16, params/opt fp32
    remat: bool = False              # jax.checkpoint the forward in the step
    grad_accum_steps: int = 1        # optax.MultiSteps microbatching
    loader_workers: int = 8          # reference: workers=8 (mv3d/train.py:31)
    loader_prefetch: int = 3


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation constants (reference `mv3d/eval/config.py:1-38`)."""

    dataset_type: str = "scannet"    # scannet | scannet_val | icl-nuim | tum-rgbd
    save_dir: str = "eval_results"
    pdist: float = 0.1               # keyframe pose-distance threshold
    n_src_on_either_side: int = 2
    z_thresh: float = 0.01           # point-cloud fusion consistency threshold
    n_consistent_thresh: int = 3     # views that must agree
    voxel_downsample: float = 0.02
    fscore_thresh: float = 0.05
    run_tsdf_fusion: bool = False
    run_pc_fusion: bool = True
    # Atlas-style TSDF fusion options
    tsdf_img_batch: int = 100
    tsdf_voxel_size: float = 0.04
    tsdf_margin: float = 1.5
    tsdf_bounds_quantile: float = 0.995
    tsdf_trunc_ratio: float = 3.0
    depth_img_size: Tuple[int, int] = (480, 640)
    # chunk sizes for whole-scene streaming inference
    init_depth_batch: int = 18
    offset_batch: int = 16
    upsample_batch: int = 100
    # fused driver (FusedSceneInference): one ref-chunk size for every
    # stage; ref totals bucket to multiples of it (on-device lax.scan)
    fused_chunk: int = 16
    eval_grid_size: Tuple[int, int, int] = (160, 160, 64)
    eval_max_anchors: int = 262144
    # auto-size the scene grid to the scene bbox (rounded up to
    # grid_bucket multiples, capped at eval_grid_size with a warning when
    # the cap clips geometry) — VERDICT r1 #9 "no silent caps"
    auto_grid: bool = True
    grid_bucket: int = 16
    # validated fast path (off = strict parity op mix): int8-quantized
    # scene-feature tables (halves the gather bytes that set the parity
    # graph's ~56 f/s ceiling, docs/ROOFLINE.md §4) + a single fine
    # offset pass in refinement iteration 2.  Acceptance gate: unseen
    # metrics within noise of the parity path (BASELINE.md).
    fast_path: bool = False
    # fast-path rank-r spectral compression of the pointflow sampling
    # interface (hypothesis.decoder_scene_projection): tables carry only
    # the top-r directions the decoder's first conv can read, shrinking
    # the dominant scene-gather rows by ~r/n_scene.  0 = off.  Default 96:
    # PASSED the 12-unseen-scene paired gate (round 5,
    # results/r5_synth48/fastpath_gate/gate_report_r96_p.json — paired
    # d(abs_rel) -0.00005+-0.001, d(fscore) -0.0019+-0.0055); disabled
    # automatically when rank >= the decoder's scene-channel count.
    fast_rank: int = 96
    # fast-path patch-fan image variance: one 4x4-patch gather per
    # (pixel, source) serves the whole depth-hypothesis fan in pointflow
    # (ops/costvolume.hypothesis_patch_variance) — (2n+1)x fewer gather
    # rows for the second-largest pointflow term.  Default on, gated by
    # the same round-5 12-scene report as fast_rank.
    fast_patch: bool = True


@dataclass(frozen=True)
class DataConfig:
    scannet_dir: str = "/data/scannet"
    icl_nuim_dir: str = "/data/icl-nuim"
    tum_rgbd_dir: str = "/data/tum-rgbd"
    img_interval: int = 20           # frame selector search interval
    num_workers: int = 8


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    batch: BatchConfig = field(default_factory=BatchConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    data: DataConfig = field(default_factory=DataConfig)
    ckpt_path: Optional[str] = None


def _overlay(dc, updates: Dict[str, Any]):
    """Recursively apply a nested dict of overrides to a dataclass tree."""
    changes = {}
    for k, v in updates.items():
        if not hasattr(dc, k):
            raise KeyError(f"unknown config key: {k!r} for {type(dc).__name__}")
        cur = getattr(dc, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            changes[k] = _overlay(cur, v)
        elif isinstance(cur, tuple) and isinstance(v, (list, tuple)):
            changes[k] = tuple(v)
        else:
            changes[k] = v
    return dataclasses.replace(dc, **changes)


def load_config(overrides: Optional[Dict[str, Any]] = None,
                yaml_path: Optional[str] = None) -> Config:
    """Build a Config, optionally overlaying a YAML file and/or a dict."""
    cfg = Config()
    if yaml_path is not None:
        import yaml

        with open(yaml_path) as f:
            cfg = _overlay(cfg, yaml.safe_load(f) or {})
    if overrides:
        cfg = _overlay(cfg, overrides)
    return cfg


def tiny_test_config() -> Config:
    """Small shapes for CPU unit/integration tests (BASELINE config 1)."""
    return load_config({
        "model": {
            "feat_dim": 8,
            "img_size": (64, 80),
            "unet_dims": (16, 24, 24),
            "unet_groups": (4, 4, 4),
            "unet_res": (1, 1, 1),
            "cost_base_channels": 4,
            "decoder_hidden": 16,
            "propagation_hidden": 8,
            # CostRegNet's 3 stride-2 levels need D, h, w divisible by 8
            "depth_train": {"n_intervals": 16, "size": (16, 16)},
            "depth_test": {"n_intervals": 16, "size": (16, 16)},
            "grid": {"grid_size": (16, 16, 16), "max_anchors": 2048},
        },
        "batch": {
            "n_scenes": 1,
            "n_ref": 3,
            "img_size": (64, 80),
            "depth_img_size": (64, 80),
        },
    })
