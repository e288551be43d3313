"""LoRA adapters for the functional layer system.

Counterpart of FunASR ``funasr/models/lora/`` (LoRA Linear/MergedLinear +
``mark_only_lora_as_trainable``, wired into SANM attention at
``sanm/attention.py:181-199`` and training at ``bin/train.py:122-126``).

Functional form: a LoRA'd linear is the base params plus {"lora_a": (r, d_in),
"lora_b": (d_out, r)}; ``lora_linear_apply`` adds the low-rank update scaled by
alpha/r. ``lora_param_filter`` builds an optax mask so only LoRA (and listed) leaves
train — the ZeRO-free equivalent of freezing the base model.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import linear_apply


def lora_init(rng, d_in: int, d_out: int, r: int = 8):
    k = jax.random.split(rng, 1)[0]
    return {
        "lora_a": jax.random.normal(k, (d_in, r)) * (1.0 / r),
        "lora_b": jnp.zeros((r, d_out)),
    }


def lora_linear_apply(base_params, lora_params, x, r: int = 8, alpha: int = 16):
    y = linear_apply(base_params, x)
    scale = alpha / r
    h = jnp.matmul(x, lora_params["lora_a"].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    h = jnp.matmul(h, lora_params["lora_b"].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return y + scale * h


def inject_lora(params, rng, targets: Sequence[str] = ("linear_q_k_v", "linear_out"),
                r: int = 8):
    """Attach LoRA factors next to every matched linear in a param pytree.

    Returns a new tree where each matched ``{"w", "b"}`` dict gains lora_a/lora_b.
    """
    counter = [0]

    def walk(node, path=""):
        if isinstance(node, dict):
            if "w" in node and node["w"].ndim == 2 and \
                    any(t in path for t in targets):
                counter[0] += 1
                k = jax.random.fold_in(rng, counter[0])
                d_in, d_out = node["w"].shape
                return {**node, **lora_init(k, d_in, d_out, r)}
            return {key: walk(v, path + "/" + key) for key, v in node.items()}
        if isinstance(node, list):
            return [walk(v, path) for v in node]
        return node

    return walk(params)


def lora_param_filter(params, extra_trainable: Sequence[str] = ()):
    """Boolean pytree: True for trainable leaves (lora_* + extras), False elsewhere.
    Use with ``optax.masked`` to train only LoRA params."""

    def walk(node, key=""):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, key) for v in node]
        trainable = key.startswith("lora_") or any(e in key for e in extra_trainable)
        return trainable

    return walk(params)


def merge_lora(params, r: int = 8, alpha: int = 16):
    """Fold LoRA factors into base weights for serving (W += scale * A @ B)."""

    def walk(node):
        if isinstance(node, dict):
            if "lora_a" in node and "w" in node:
                scale = alpha / r
                merged = node["w"] + scale * (node["lora_a"] @ node["lora_b"])
                return {k: v for k, v in
                        {**node, "w": merged}.items()
                        if not k.startswith("lora_")}
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)
