"""LR schedules (counterpart of FunASR ``funasr/schedulers/``: warmuplr
``warmup_lr.py``, tri-stage, noam; wired in ``funasr/bin/train.py:185-188``)."""

from __future__ import annotations

import optax

from funasr_tpu.register import tables


def warmuplr(lr: float = 1e-3, warmup_steps: int = 25000, **kwargs):
    """lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5) (espnet WarmupLR)."""
    def schedule(step):
        import jax.numpy as jnp
        s = step + 1.0
        return lr * (warmup_steps ** 0.5) * jnp.minimum(
            s ** -0.5, s * warmup_steps ** -1.5)
    return schedule


def noamlr(lr: float = 1.0, model_size: int = 512, warmup_steps: int = 25000,
           **kwargs):
    def schedule(step):
        import jax.numpy as jnp
        s = step + 1.0
        return lr * model_size ** -0.5 * jnp.minimum(s ** -0.5,
                                                     s * warmup_steps ** -1.5)
    return schedule


def tri_stage(lr: float = 1e-3, phase_ratio=(0.1, 0.4, 0.5), total_steps: int = 100000,
              init_lr_scale: float = 0.01, final_lr_scale: float = 0.01, **kwargs):
    w, h, d = [int(r * total_steps) for r in phase_ratio]
    return optax.join_schedules(
        [optax.linear_schedule(lr * init_lr_scale, lr, w),
         optax.constant_schedule(lr),
         optax.exponential_decay(lr, d, final_lr_scale)],
        boundaries=[w, w + h])


tables.scheduler_classes["warmuplr"] = warmuplr
tables.scheduler_classes["noamlr"] = noamlr
tables.scheduler_classes["tri_stage"] = tri_stage


def build_scheduler(scheduler: str = "warmuplr", scheduler_conf=None,
                    base_lr: float = None):
    conf = dict(scheduler_conf or {})
    if base_lr is not None:
        conf.setdefault("lr", base_lr)
    factory = tables.scheduler_classes.get(scheduler)
    if factory is None:
        raise KeyError(f"unknown scheduler {scheduler}")
    return factory(**conf)
