"""Optimizers with torch-matching update rules.

The reference trains with ``torch.optim.Adam(lr, weight_decay=1e-5)``
(reference train.py:111-112 — note its ``--weight-decay`` flag is ignored and
1e-5 is hardcoded; we honor the flag but default it to 1e-5). Torch's Adam
applies weight decay as L2 *added to the gradient before* the adam moments
(not AdamW), so the decay term must precede ``scale_by_adam`` in the chain.
Also provides the SGD builder mirroring the classification facade
(reference lib/build_optimizer.py:4-11).
"""
from __future__ import annotations

from typing import Callable, Union

import optax

ScalarOrSchedule = Union[float, Callable[[int], float]]


def _scale_by_lr(lr: ScalarOrSchedule):
    if callable(lr):
        return optax.scale_by_schedule(lambda step: -lr(step))
    return optax.scale(-lr)


def adam_l2(lr: ScalarOrSchedule, weight_decay: float = 1e-5,
            b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """torch.optim.Adam semantics (L2 coupled into the gradient)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(_scale_by_lr(lr))
    return optax.chain(*parts)


def sgd(lr: ScalarOrSchedule, momentum: float = 0.9,
        weight_decay: float = 0.0, nesterov: bool = False):
    """torch.optim.SGD semantics (reference lib/build_optimizer.py:4-11)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(_scale_by_lr(lr))
    return optax.chain(*parts)


OPTIMIZER_REGISTRY = {"adam": adam_l2, "sgd": sgd}


def build_optimizer(name: str, lr: ScalarOrSchedule, **kwargs):
    return OPTIMIZER_REGISTRY[name](lr, **kwargs)
