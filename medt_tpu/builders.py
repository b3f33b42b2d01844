"""Builder facade — args-driven factory registry.

Equivalent of the reference's ``lib`` package API
(reference lib/__init__.py:1-7): ``build_dataloader(args)``,
``build_model(args)``, ``build_optimizer(args, model_params)``, and the
running-average ``Metric`` — the registry surface its missing ImageNet
classification driver consumed (reference lib/build_model.py:4-6,
lib/build_dataloader.py:4-5, lib/build_optimizer.py:4-11). Unlike the
reference, the driver exists here: ``medt_tpu.cli.train_cls``.

``args`` is any object with attributes (an argparse Namespace or a Config).
"""
from __future__ import annotations

from typing import Any

from .data.imagenet import ImageFolderDataset
from .data.loader import DataLoader
from .metrics import Metric
from .models import MODEL_REGISTRY
from .models import classifiers as _classifiers
from .models import resnet as _resnet
from .training.optimizers import adam_l2, sgd

# classification model names resolve like the reference's
# ``models.__dict__[args.model]`` (lib/build_model.py:4-6)
CLASSIFIER_REGISTRY = {
    "resnet18": _resnet.resnet18,
    "resnet26": _resnet.resnet26,
    "resnet34": _resnet.resnet34,
    "resnet50": _resnet.resnet50,
    "resnet101": _resnet.resnet101,
    "resnet152": _resnet.resnet152,
    "axial26s": _classifiers.axial26s,
    "axial50s": _classifiers.axial50s,
    "axial50m": _classifiers.axial50m,
    "axial50l": _classifiers.axial50l,
}


def build_model(args: Any):
    """Resolve ``args.model`` against classifiers first, then the
    segmentation registry."""
    name = getattr(args, "model", None) or getattr(args, "modelname")
    if name in CLASSIFIER_REGISTRY:
        kwargs = {}
        if hasattr(args, "num_classes"):
            kwargs["num_classes"] = args.num_classes
        return CLASSIFIER_REGISTRY[name](**kwargs)
    if name in MODEL_REGISTRY:
        return MODEL_REGISTRY[name](
            img_size=getattr(args, "imgsize", 128),
            num_classes=getattr(args, "num_classes", 2),
        )
    raise KeyError(
        f"unknown model {name!r}; classifiers: {sorted(CLASSIFIER_REGISTRY)}; "
        f"segmentation: {sorted(MODEL_REGISTRY)}"
    )


def build_dataloader(args: Any):
    """(train_loader, val_loader) over an ImageFolder dataset.

    ``args.distributed`` switches on per-host sharding — the TPU-native
    replacement for the reference's DistributedSampler
    (reference lib/datasets/imagenet1k.py:31-34).
    """
    import jax

    shard = None
    if getattr(args, "distributed", False):
        shard = (jax.process_index(), jax.process_count())
    img_size = getattr(args, "imgsize", 224)
    train_ds = ImageFolderDataset(args.train_dataset, img_size, train=True,
                                  shard=shard)
    val_ds = ImageFolderDataset(args.val_dataset, img_size, train=False,
                                shard=shard)
    workers = getattr(args, "workers", 4)
    batch = getattr(args, "batch_size", 32)
    return (
        DataLoader(train_ds, batch, shuffle=True, num_workers=workers),
        DataLoader(val_ds, batch, shuffle=False, num_workers=workers),
    )


def build_optimizer(args: Any):
    """SGD by default, matching lib/build_optimizer.py:4-11; adam optional."""
    name = getattr(args, "optimizer", "sgd")
    lr = getattr(args, "lr", None) or getattr(args, "learning_rate", 0.1)
    wd = getattr(args, "weight_decay", 1e-4)
    if name == "sgd":
        return sgd(lr, momentum=getattr(args, "momentum", 0.9),
                   weight_decay=wd)
    return adam_l2(lr, weight_decay=wd)


__all__ = ["CLASSIFIER_REGISTRY", "Metric", "build_dataloader", "build_model",
           "build_optimizer"]
