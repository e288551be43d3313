"""Optimizer registry -> optax transforms (counterpart of FunASR
``funasr/optimizers/`` + torch natives wired in ``funasr/bin/train.py:178-181``)."""

from __future__ import annotations

import optax

from funasr_tpu.register import tables


def _adam(lr, weight_decay: float = 0.0, betas=(0.9, 0.999), eps: float = 1e-8,
          **kwargs):
    if weight_decay:
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


def _adamw(lr, weight_decay: float = 0.01, betas=(0.9, 0.999), eps: float = 1e-8,
           **kwargs):
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay)


def _sgd(lr, momentum: float = 0.0, weight_decay: float = 0.0, **kwargs):
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay),
                           optax.sgd(lr, momentum=momentum or None))
    return optax.sgd(lr, momentum=momentum or None)


def _fairseq_adam(lr, adam_b1: float = 0.9, adam_b2: float = 0.98,
                  adam_eps: float = 1e-8, weight_decay: float = 0.0, **kwargs):
    return _adam(lr, weight_decay=weight_decay, betas=(adam_b1, adam_b2),
                 eps=adam_eps)


tables.optim_classes["adam"] = _adam
tables.optim_classes["adamw"] = _adamw
tables.optim_classes["sgd"] = _sgd
tables.optim_classes["fairseq_adam"] = _fairseq_adam


def build_optimizer(optim: str = "adam", optim_conf=None, schedule=None):
    """Returns an optax transform; ``schedule`` (callable step->lr) overrides the
    static lr from optim_conf."""
    conf = dict(optim_conf or {})
    lr = conf.pop("lr", 1e-3)
    factory = tables.optim_classes.get(optim)
    if factory is None:
        raise KeyError(f"unknown optimizer {optim}; have {sorted(tables.optim_classes)}")
    return factory(schedule if schedule is not None else lr, **conf)
