"""Optimizer / dataloader config presets targeting optax.

Counterpart of the reference's torch presets (wisp/config/presets/torch.py:21-80):
ConfigAdam / ConfigAdamW / ConfigRMSprop / ConfigFusedAdam → here all map onto optax (XLA fuses
optimizer updates into the train step, so every optimizer is "fused" on TPU; the apex FusedAdam
preset therefore folds into ConfigAdam).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import optax

from wisp_tpu.config.utils import configure


def _adam(lr: float = 1e-3, betas: Tuple[float, float] = (0.9, 0.999),
          eps: float = 1e-8, weight_decay: float = 0.0):
    if weight_decay > 0:
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


def _rmsprop(lr: float = 1e-3, alpha: float = 0.99, eps: float = 1e-8,
             momentum: float = 0.0, weight_decay: float = 0.0):
    opt = optax.rmsprop(lr, decay=alpha, eps=eps, momentum=momentum or None)
    if weight_decay > 0:
        opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
    return opt


def _sgd(lr: float = 1e-3, momentum: float = 0.0, weight_decay: float = 0.0):
    opt = optax.sgd(lr, momentum=momentum or None)
    if weight_decay > 0:
        opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
    return opt


@configure(target=_adam, name="Adam")
class ConfigAdam:
    """Adam (reference ConfigAdam, config/presets/torch.py:21-41; eps=1e-15 is the
    instant-ngp convention set per-app). On TPU every optimizer is fused by XLA, so the
    reference's apex FusedAdam preset folds into this one."""
    lr: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.0


def _adamw(lr: float = 1e-3, betas: Tuple[float, float] = (0.9, 0.999),
           eps: float = 1e-8, weight_decay: float = 1e-2):
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)


@configure(target=_adamw, name="AdamW")
class ConfigAdamW:
    """AdamW (reference ConfigAdamW)."""
    lr: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 1e-2


@configure(target=_rmsprop, name="RMSprop")
class ConfigRMSprop:
    """RMSprop (reference ConfigRMSprop, config/presets/torch.py:44-58)."""
    lr: float = 1e-3
    alpha: float = 0.99
    eps: float = 1e-8
    momentum: float = 0.0
    weight_decay: float = 0.0


@configure(target=_sgd, name="SGD")
class ConfigSGD:
    lr: float = 1e-3
    momentum: float = 0.0
    weight_decay: float = 0.0


@dataclasses.dataclass
class ConfigDataloader:
    """Dataloader settings (reference ConfigDataloader, config/presets/torch.py:61-80).
    On TPU the input pipeline is host-side numpy; num_workers maps to dataset
    multiprocessing loaders."""
    batch_size: int = 1
    num_workers: int = 0
