"""Configuration dataclasses.

Flag names mirror the reference CLI (/root/reference/train_patch2pix.py:17-75)
for 1:1 experiment parity; configs serialise to JSON next to checkpoints
so checkpoints stay self-describing (the reference persists its config
Namespace inside the .pth dict, /root/reference/utils/train/helper.py:9-33).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class RegressorConfig:
    """FeatRegressNet architecture (reference defaults,
    /root/reference/train_patch2pix.py:46-55)."""

    feat_comb: str = "pre"  # concat features before ('pre') or after ('post') conv
    conv_kers: Tuple[int, ...] = (3, 3)
    conv_dims: Tuple[int, ...] = (512, 512)
    conv_strs: Tuple[int, ...] = (2, 1)
    fc_dims: Tuple[int, ...] = (512, 256)
    psize: Tuple[int, int] = (16, 16)
    pshift: int = 8
    panc: int = 8  # anchor expansion at train; forced to 1 at eval
    shared: bool = False  # share mid/fine regressor weights
    feat_dim: int = 259  # filled from backbone dims + feat_idx


@dataclass
class ModelConfig:
    backbone: str = "ResNet34"
    change_stride: bool = False  # layer3 stride 2 -> 1 (upsample 16 -> 8)
    feat_idx: Tuple[int, ...] = (0, 1, 2, 3)
    regressor: Optional[RegressorConfig] = field(default_factory=RegressorConfig)
    # feature dims of the ResNet34 pyramid levels [im, conv1, layer1, layer2]
    # (+ layer3=256 for level 4); see /root/reference/networks/patch2pix.py:20
    feat_dims: Tuple[int, ...] = (3, 64, 64, 128, 256)
    # compute dtype for conv/matmul activations ("float32" | "bfloat16");
    # params stay float32, correlation/losses accumulate in float32
    dtype: str = "float32"
    # patch-gather strategy: "auto" picks the superblock row-gather
    # whenever the static shapes allow it; "block" forces the
    # dynamic-slice path (A/B benchmarking)
    gather: str = "auto"

    @property
    def compute_dtype(self):
        import jax.numpy as jnp

        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    @property
    def upsample(self) -> int:
        return 8 if self.change_stride else 16

    @property
    def feats_downsample(self) -> Tuple[int, ...]:
        ds = [1, 2, 2, 2, 2]
        if self.change_stride:
            ds[-1] = 1
        return tuple(ds)

    def resolved(self) -> "ModelConfig":
        """Fill derived fields (regressor feat_dim from feat_idx)."""
        if self.regressor is not None:
            fd = sum(self.feat_dims[i] for i in self.feat_idx)
            self.regressor.feat_dim = fd
        return self


@dataclass
class OptimConfig:
    opt: str = "adam"
    lr_init: float = 5e-4
    weight_decay: float = 0.0
    # ('step', factor, step) or ('multistep', factor, *steps) or None
    lr_decay: Optional[Tuple] = None
    epochs: int = 100


@dataclass
class TrainConfig:
    seed: int = 1
    epochs: int = 100
    save_step: int = 1
    batch: int = 4
    ksize: int = 2
    freeze_feat: int = 87  # reference param-count indexing; we freeze whole backbone
    ptmax: int = 400
    cthres: float = 0.5
    cls_dthres: Tuple[int, int] = (50, 5)
    epi_dthres: Tuple[int, int] = (50, 5)
    weight_cls: float = 10.0
    weight_epi: Tuple[float, float] = (1.0, 1.0)  # (fine, mid)
    out_dir: str = "output/patch2pix"
    data_root: str = "data"
    pair_root: str = "data_pairs"
    match_npy: str = "megadepth_pairs.ov0.35_imrat1.5.pair500.excl_test.npy"
    # image size for training pairs (reference: 480x320,
    # /root/reference/train_patch2pix.py:236)
    wt: int = 480
    ht: int = 320


def to_json(cfg) -> str:
    def default(o):
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        if isinstance(o, tuple):
            return list(o)
        raise TypeError(type(o))

    return json.dumps(dataclasses.asdict(cfg), indent=2, default=default)


def _from_dict(cls, d):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            continue
        ft = fields[k].type
        if k == "regressor" and v is not None:
            v = _from_dict(RegressorConfig, v)
        elif isinstance(v, list):
            v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        kwargs[k] = v
    return cls(**kwargs)


def model_config_from_json(s: str) -> ModelConfig:
    return _from_dict(ModelConfig, json.loads(s))
