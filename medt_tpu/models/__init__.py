"""Model registry.

Factory names mirror the reference CLI surface (`--modelname`,
reference train.py:95-102) and the factory functions at reference
axialnet.py:714-728: all use layers [1,2,4,1] at width scale s=0.125.
Additional registry entries cover the experimental zoo
(reference lib/models/model_codes.py:2259-2323).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

from .axial_unet import ResAxialAttentionUNet
from .blocks import AxialBlock, AxialStage
from .medt import MedTNet, batch_to_space, space_to_batch

MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_model(name):
    def wrap(fn):
        MODEL_REGISTRY[name] = fn
        return fn
    return wrap


def build_model(name: str, *, img_size: Optional[int] = None, imgchan: int = 3,
                num_classes: int = 2, dtype=None, use_fused: bool = False,
                **kwargs):
    """Instantiate a model by its reference-CLI name.

    ``img_size=None`` lets each factory pick its native default (128 for the
    base models, 512 for the ``*_512`` variants); an explicit value is always
    honored. (imgchan is accepted for API parity; flax infers input channels
    lazily.)
    """
    del imgchan  # input channels are inferred at init time from the input
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    if img_size is not None:
        kwargs["img_size"] = img_size
    return MODEL_REGISTRY[name](
        num_classes=num_classes, dtype=dtype, use_fused=use_fused, **kwargs
    )


@register_model("axialunet")
def axialunet(**kw):
    """Ungated axial-attention U-Net (reference axialnet.py:714-716)."""
    return ResAxialAttentionUNet(attention_mode="full", s=0.125, **kw)


@register_model("gatedaxialunet")
def gatedaxialunet(**kw):
    """Gated axial-attention U-Net (reference 'gated', axialnet.py:718-720)."""
    return ResAxialAttentionUNet(attention_mode="gated", s=0.125, **kw)


@register_model("MedT")
def medt(**kw):
    """LoGo net: gated global branch + no-position local branch
    (reference axialnet.py:722-724)."""
    return MedTNet(global_mode="gated", local_mode="wopos", s=0.125, **kw)


@register_model("logo")
def logo(**kw):
    """LoGo training strategy with plain axial blocks in both branches
    (reference axialnet.py:726-728)."""
    return MedTNet(global_mode="full", local_mode="full", s=0.125, **kw)


# ---- experimental zoo (reference lib/models/model_codes.py) ---------------

@register_model("gated_sig")
def gated_sig(**kw):
    """Sigmoid-squashed frozen gates (model_codes.py:215-314).

    The reference freezes these at (0.1, 0.1, 0.1, 5.0) — sigmoid(5.0)~0.99
    on the sv branch (model_codes.py:241-244). ``trainable_gates=True`` is an
    opt-in for the trained-gate setting described in the paper.
    """
    kw.setdefault("gate_init", (0.1, 0.1, 0.1, 5.0))
    kw.setdefault("trainable_gates", False)
    return ResAxialAttentionUNet(attention_mode="gated_sig", s=0.125, **kw)


@register_model("gated_data")
def gated_data(**kw):
    """Per-sample data-dependent gates from a GAP->MLP head
    (model_codes.py:316-444)."""
    return ResAxialAttentionUNet(attention_mode="gated_data", s=0.125, **kw)


@register_model("convnet_ablation")
def convnet_ablation(**kw):
    """Attention-disabled pure-conv ablation (AxialBlockmod,
    model_codes.py:661-716)."""
    return ResAxialAttentionUNet(attention_mode="full", use_attention=False,
                                 s=0.125, **kw)


@register_model("medt_512")
def medt_512(**kw):
    """512px LoGo variant: same 4x4 grid, 128px patches
    (mix_512, model_codes.py:1894-2096). An explicit ``img_size`` — even
    128 — is honored; only the default differs from the base MedT."""
    kw.setdefault("img_size", 512)
    return MedTNet(global_mode="gated", local_mode="wopos", s=0.125, **kw)


@register_model("logo_512")
def logo_512(**kw):
    """512px logo (mix_net_512, model_codes.py:2306-2308)."""
    kw.setdefault("img_size", 512)
    return MedTNet(global_mode="full", local_mode="full", s=0.125, **kw)


@register_model("mix_net_gated_d")
def mix_net_gated_d(**kw):
    """Dual-branch LoGo built entirely from data-gated blocks: the zoo's
    ``mix`` prototype with ``AxialBlock_gated_data`` in BOTH branches
    (reference model_codes.py:2306-2308 passing one block class to
    mix :1229-1236, whose layer1..4 and *_p layers all use it; the
    per-sample GAP->MLP->sigmoid gates are model_codes.py:316-444)."""
    return MedTNet(global_mode="gated_data", local_mode="gated_data",
                   s=0.125, **kw)


@register_model("axialunet_wopos")
def axialunet_wopos(**kw):
    """Position-free U-Net (resxialunet_wopos, model_codes.py:2287-2289)."""
    return ResAxialAttentionUNet(attention_mode="wopos", s=0.125, **kw)


@register_model("unetplusplus")
def unetplusplus(**kw):
    """Single-conv stem + softmax head + deep supervision
    (unetplus, model_codes.py:1091-1227, factory :2295-2297)."""
    return ResAxialAttentionUNet(
        attention_mode="full", use_attention=False, stem_mode="single",
        final_softmax=True, deep_supervision=True, s=0.125, **kw
    )


@register_model("shallow")
def shallow(**kw):
    """2-stage encoder/decoder (ResAxialAttentionUNetshallow,
    model_codes.py:2097-2222, factory resxialunet128s_shallow :2320-2322)."""
    return ResAxialAttentionUNet(
        attention_mode="full", use_attention=False, num_stages=2, s=0.125, **kw
    )


@register_model("autoencoder")
def autoencoder(img_size=None, num_classes=2, dtype=None, use_fused=False, **kw):
    """Conv autoencoder (model_codes.py:2224-2256)."""
    from .classifiers import ConvAutoencoder

    del img_size, num_classes, use_fused
    return ConvAutoencoder(dtype=dtype, **kw)


__all__ = [
    "AxialBlock",
    "AxialStage",
    "MODEL_REGISTRY",
    "MedTNet",
    "ResAxialAttentionUNet",
    "batch_to_space",
    "build_model",
    "register_model",
    "space_to_batch",
]
