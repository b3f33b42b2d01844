"""Typed configuration shared by the train and test CLIs.

One dataclass replaces the reference's two drifting argparse blocks
(reference train.py:30-64 vs test.py:28-58 — whose drift leaves test.py
reading an ``--aug`` flag it never defines, test.py:62, a crash we fix).
Flag names preserve the reference CLI surface. Flags the reference parses
but ignores are honored here and noted: ``--workers`` (never wired into the
DataLoader, reference train.py:90), ``--weight-decay`` (Adam hardcodes 1e-5,
reference train.py:111-112).
"""
from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional


@dataclass
class Config:
    # data
    train_dataset: Optional[str] = None
    val_dataset: Optional[str] = None
    crop: Optional[int] = None
    imgsize: int = 128
    gray: str = "no"                 # "yes" -> single channel + gray thresholds
    workers: int = 8                 # honored (unlike the reference)
    # model
    modelname: str = "MedT"
    # training
    epochs: int = 400
    start_epoch: int = 0
    batch_size: int = 1
    learning_rate: float = 1e-3
    momentum: float = 0.9            # used by --optimizer sgd
    weight_decay: float = 1e-5       # honored (unlike the reference)
    optimizer: str = "adam"
    lr_schedule: str = "constant"    # constant | cosine | linear
    warmup_epochs: int = 0
    save_freq: int = 10
    seed: int = 3000                 # reference pins this (train.py:118-121)
    # io
    direc: str = "./medt"
    loaddirec: Optional[str] = None
    resume: bool = False
    # evaluation / output semantics
    pred_mode: str = "threshold"     # reference quirk: logits>=0.5 on channel 1
    # ("argmax" = corrected decision rule)
    # performance
    use_pallas: str = "yes"          # fused Pallas attention on the eval path
    remat: bool = False              # rematerialize fwd in bwd (bigger batches)
    dtype: str = "float32"           # float32 | bfloat16 compute
    # the released reference FREEZES its attention gates (axialnet.py:124-127);
    # "yes" trains them instead — the paper's described setting
    trainable_gates: str = "no"
    aug: str = "off"
    profile_dir: Optional[str] = None
    # parallelism
    dp: Optional[int] = None
    sp: Optional[int] = None
    tp: Optional[int] = None
    # multi-slice (DCN) topology: None = auto-detect from device
    # slice_index; >1 pins the slice count (data axis spans slices,
    # seq/model stay on ICI — see parallel/mesh.py::make_mesh)
    num_slices: Optional[int] = None
    # serving (cli/serve.py)
    port: int = 8900
    # backend override: the sandbox preimports jax with its own platform and
    # scrubs JAX_PLATFORMS, so CPU-forcing must happen via jax.config — this
    # flag is the CLI surface for it (e.g. --platform cpu for host-only runs)
    platform: Optional[str] = None

    @property
    def imgchan(self) -> int:
        return 1 if self.gray == "yes" else 3

    @property
    def crop_tuple(self):
        return (self.crop, self.crop) if self.crop is not None else None


def add_args(parser: argparse.ArgumentParser) -> None:
    for field in dataclasses.fields(Config):
        name = "--" + field.name
        aliases = []
        if field.name == "workers":
            aliases = ["-j"]
        if field.name == "batch_size":
            aliases = ["-b"]
        if field.name == "weight_decay":
            aliases = ["--wd", "--weight-decay"]
        if field.name == "start_epoch":
            aliases = ["--start-epoch"]
        kwargs = {"default": field.default}
        if field.type in ("int", "Optional[int]"):
            kwargs["type"] = int
        elif field.type in ("float", "Optional[float]"):
            kwargs["type"] = float
        elif field.type == "bool":
            kwargs["action"] = "store_true"
            kwargs.pop("default")
        else:
            kwargs["type"] = str
        parser.add_argument(name, *aliases, **kwargs)


def parse_config(argv=None, description: str = "medt_tpu") -> Config:
    from .utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # every CLI benefits from warm XLA/Mosaic compiles
    parser = argparse.ArgumentParser(description=description)
    add_args(parser)
    ns = parser.parse_args(argv)
    cfg = Config(**{f.name: getattr(ns, f.name)
                    for f in dataclasses.fields(Config)})
    if cfg.platform:
        import jax

        # must land before any backend initialization; env-var routes are
        # scrubbed by the sandbox (see Config.platform)
        jax.config.update("jax_platforms", cfg.platform)
    return cfg
