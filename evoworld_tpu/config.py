"""Typed configuration tree with dotted CLI overrides.

Replaces the reference's three uncoordinated config layers (argparse per
entry point + shell variables + accelerate/DeepSpeed YAML — SURVEY.md §5.6)
with one dataclass tree. Every CLI accepts `--section.field=value` overrides
plus a few positional conveniences.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

from evoworld_tpu.diffusion.pipeline import PipelineConfig
from evoworld_tpu.loop.unified import LoopConfig
from evoworld_tpu.train.train_step import TrainConfig
from evoworld_tpu.train.trainer import TrainerConfig


@dataclasses.dataclass(frozen=True)
class DataConfig:
    root: str = "/root/reference/example/case_000"
    height: int = 576
    width: int = 1024
    sequence_length: int = 25
    sampling: str = "reprojection"
    # Data-engine capture convention for cube_to_pano ("unity" | "ue"); a
    # separate knob from `sampling` (dataset memory modes) on purpose.
    engine: str = "unity"
    reprojection_name: str = "rendered_panorama_vggt_open3d"
    memory_path: Optional[str] = None
    pos_scale: float = 0.1
    single_episode: bool = True
    start_idx: int = 0
    end_idx: int = -1
    # Sky masking for the OFFLINE reprojection tool (reference defaults
    # mask_sky=True there, reproject_vggt_open3d.py:295; the unified loop
    # hardcodes False, unified_loop_consistency.py:478 — unaffected).
    mask_sky: bool = True


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    seed: int = 42
    compute_dtype: str = "bfloat16"
    model_preset: str = "full"  # "full" | "tiny" (smoke runs without weights)
    mesh_data: int = 0          # 0 -> all devices on the data axis
    mesh_model: int = 1
    checkpoint_dir: Optional[str] = None      # converted-weights dir
    svd_checkpoint: Optional[str] = None      # HF-format SVD pipeline dir
    vggt_checkpoint: Optional[str] = None
    vggt_tiny: bool = False  # small random VGGT (CPU demos / smoke runs)
    # Shard VGGT reconstruction over the inference mesh (frame axis for the
    # per-frame work, head axis for global attention). On one device this is
    # a no-op; set false to force single-device VGGT (+ host param offload).
    vggt_mesh: bool = True
    metric_weights_dir: str = ""  # dir with lpips.pt / inception_v4.pt / i3d.pt
    skyseg_onnx: str = "skyseg.onnx"  # U^2-Net sky-seg weights (reference name)
    dreamsim_variant: str = "dino_vitb16"  # "dino_vitb16" | "ensemble"
    allow_random_weights: bool = True
    save_dir: str = "outputs"
    profile: bool = False


@dataclasses.dataclass(frozen=True)
class ParityConfig:
    """Weights-day parity gate (cli/validate_parity.py): thresholds and
    reference-output sources for the BASELINE.md north-star check
    (PSNR / LPIPS within `tolerance` of the torch reference's scores)."""

    # Dry-run: random weights, tiny shapes — proves the gate's plumbing runs
    # end-to-end today; the identical command validates for real the day
    # checkpoints arrive (drop dry_run, point at the weights).
    dry_run: bool = False
    # Reference scores, one of:
    #   reference_scores: the reference harness's eval_score.json (value_mean
    #       fields), produced by /root/reference/calculate_metrics.sh; or
    #   reference_frames: a dir of the reference's generated PNGs for the
    #       same episode/segment — we score them against GT ourselves.
    reference_scores: str = ""
    reference_frames: str = ""
    # Opt-in: bilinear-resize size-mismatched reference frames instead of
    # failing (resampling biases PSNR/LPIPS — the gate warns when active).
    resize_reference: bool = False
    tolerance: float = 0.01  # 1% gate, BASELINE.md north-star table
    metrics: str = "psnr,lpips"


@dataclasses.dataclass(frozen=True)
class EvoWorldConfig:
    pipeline: PipelineConfig = PipelineConfig()
    loop: LoopConfig = LoopConfig()
    train: TrainConfig = TrainConfig()
    trainer: TrainerConfig = TrainerConfig()
    data: DataConfig = DataConfig()
    runtime: RuntimeConfig = RuntimeConfig()
    parity: ParityConfig = ParityConfig()


def _coerce(value: str, current):
    t = type(current)
    if t is bool:
        return value.lower() in ("1", "true", "yes")
    if current is None:
        return value
    if t in (int, float, str):
        return t(value)
    if t is tuple:
        parts = [p for p in value.strip("()[] ").split(",") if p]
        elem = type(current[0]) if current else str
        return tuple(elem(p) for p in parts)
    raise ValueError(f"cannot coerce {value!r} to {t}")


def apply_overrides(config: EvoWorldConfig, argv: Sequence[str]) -> EvoWorldConfig:
    """Apply `--section.field=value` (or `--section.field value`) overrides."""
    updates: dict[str, dict] = {}
    args = list(argv)
    i = 0
    while i < len(args):
        arg = args[i]
        if not arg.startswith("--"):
            raise SystemExit(f"unexpected argument {arg!r}")
        body = arg[2:]
        if "=" in body:
            key, value = body.split("=", 1)
        else:
            if i + 1 >= len(args):
                raise SystemExit(f"missing value for {arg}")
            key, value = body, args[i + 1]
            i += 1
        i += 1
        if "." not in key:
            raise SystemExit(f"override must be section.field, got {key!r}")
        section, field = key.split(".", 1)
        updates.setdefault(section, {})[field] = value

    out = config
    for section, fields in updates.items():
        sub = getattr(out, section, None)
        if sub is None:
            raise SystemExit(f"unknown config section {section!r}")
        coerced = {}
        for field, raw in fields.items():
            if not hasattr(sub, field):
                raise SystemExit(f"unknown field {section}.{field}")
            coerced[field] = _coerce(raw, getattr(sub, field))
        out = dataclasses.replace(out, **{section: dataclasses.replace(sub, **coerced)})
    return out


def describe(config: EvoWorldConfig) -> str:
    import json

    return json.dumps(dataclasses.asdict(config), indent=2, default=str)
