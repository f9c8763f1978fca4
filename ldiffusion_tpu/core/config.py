"""Typed configuration for the whole framework.

The reference scatters configuration across argparse CLIs, env vars, an inline
DeepSpeed dict and a generated plans.json (reference ``ldiffusion.py:19-29``,
``ldiffusion.py:165-188``, ``model/nnunetv2/paths.py:21-39``). Here everything
is a frozen dataclass so configs are hashable (jit-static) and serializable.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


def _asdict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _asdict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_asdict(x) for x in obj]
    return obj


class _JsonMixin:
    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2)

    @classmethod
    def from_dict(cls, d: dict):
        names = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in d.items():
            if k not in names:
                continue
            t = names[k].type
            if isinstance(v, list):
                v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
            kwargs[k] = v
        return cls(**kwargs)  # type: ignore[call-arg]


@dataclass(frozen=True)
class MeshConfig(_JsonMixin):
    """Device-mesh layout.

    ``data`` shards the batch (reference DP: DistributedSampler,
    ``ldiffusion.py:100-110``); ``fsdp`` shards parameters and optimizer state
    (reference ZeRO-3, ``ldiffusion.py:176-187``). Both axes ride ICI; XLA
    inserts all-gather/reduce-scatter where the shardings require them.
    """

    data: int = -1  # -1: use all devices not claimed by other axes
    fsdp: int = 1
    tensor: int = 1  # reserved; reference has no TP (SURVEY §2.3)

    def resolved(self, n_devices: int) -> "MeshConfig":
        data = self.data
        if data == -1:
            denom = self.fsdp * self.tensor
            assert n_devices % denom == 0, (n_devices, denom)
            data = n_devices // denom
        assert data * self.fsdp * self.tensor == n_devices, (
            f"mesh {data}x{self.fsdp}x{self.tensor} != {n_devices} devices"
        )
        return MeshConfig(data=data, fsdp=self.fsdp, tensor=self.tensor)


@dataclass(frozen=True)
class DiffusionTrainConfig(_JsonMixin):
    """Stage-1 Laplace warm-up hyperparameters (reference ``ldiffusion.py:121-199``)."""

    num_epochs: int = 10              # hardcoded 10 in reference (:122)
    batch_size: int = 1
    num_inference_steps: int = 25     # CLI value; trajectory uses steps/5 (:198)
    learning_rate: float = 1e-5       # AdamW (:171)
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.01
    grad_clip: float = 1.0            # (:187)
    prompt: str = "A pathological slide"  # (:211)
    latent_size: int = 64             # images resized to 64x64 (:200,212)
    image_size: int = 1024
    param_dtype: str = "float32"      # fp16 disabled in reference (:188); bf16 compute
    compute_dtype: str = "bfloat16"
    remat: bool = True                # trade FLOPs for HBM across the timestep scan
    seed: int = 0
    num_classes: Optional[int] = None  # enables per-class anchor floor in InfoNCE


@dataclass(frozen=True)
class SegmentorTrainConfig(_JsonMixin):
    """Stage-2 nnUNet-style trainer hyperparameters (reference
    ``model/nnunetv2/training/nnUNetTrainer/nnUNetTrainer.py:140-160``)."""

    num_epochs: int = 90              # reference: args.num_epochs - 10 (:311)
    iters_per_epoch: int = 250        # (:151)
    val_iters_per_epoch: int = 50     # (:152)
    initial_lr: float = 1e-2          # SGD nesterov (:145)
    weight_decay: float = 3e-5        # (:146)
    momentum: float = 0.99
    oversample_fg: float = 0.33       # (:147)
    grad_clip: float = 12.0           # (:910)
    ema_decay: float = 0.9            # EMA pseudo-dice (logger :49-52)
    save_every: int = 50              # checkpoint_latest cadence (:181)
    compute_dtype: str = "bfloat16"   # replaces CUDA AMP fp16
    deep_supervision: bool = True
    seed: int = 12345


@dataclass(frozen=True)
class LDiffusionConfig(_JsonMixin):
    """Top-level config for :class:`ldiffusion_tpu.api.LDiffusionModel`."""

    diffusion_path: str = ""
    level: str = "tissue"             # "tissue" | "cell"
    num_classes: int = 7
    image_dir: str = ""
    label_dir: str = ""
    train_ratio: float = 0.7          # 70/30 split (reference ldiffusion.py:72,87)
    work_dir: str = "train_save"
    mesh: MeshConfig = field(default_factory=MeshConfig)
    diffusion: DiffusionTrainConfig = field(default_factory=DiffusionTrainConfig)
    segmentor: SegmentorTrainConfig = field(default_factory=SegmentorTrainConfig)
    seed: int = 0
