"""RWKV encoder + BAT (boundary-aware transducer) family.

TPU-native rebuilds of FunASR ``funasr/models/rwkv_bat/`` and ``funasr/models/bat/``:
an RWKV time-mix/channel-mix encoder (linear attention via the WKV recurrence as a
``lax.scan`` — O(T) streaming-friendly), and BAT = transducer whose lattice loss is
restricted to a band around CIF-predicted boundaries (here: the full RNN-T loss with
boundary-masked logits, keeping the training contract).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    layer_norm_apply, layer_norm_init, linear_apply, linear_init, make_pad_mask)
from funasr_tpu.core.module import stack_params
from funasr_tpu.register import tables


class RWKVConfig(NamedTuple):
    input_size: int
    output_size: int = 256
    num_blocks: int = 6
    ffn_mult: int = 4


def _rwkv_block_init(rng, d: int, ffn: int):
    keys = jax.random.split(rng, 7)
    return {
        "ln1": layer_norm_init(d),
        "time_decay": jnp.zeros((d,)),
        "time_first": jnp.zeros((d,)),
        "r_proj": linear_init(keys[0], d, d, bias=False),
        "k_proj": linear_init(keys[1], d, d, bias=False),
        "v_proj": linear_init(keys[2], d, d, bias=False),
        "o_proj": linear_init(keys[3], d, d, bias=False),
        "ln2": layer_norm_init(d),
        "ffn_k": linear_init(keys[4], d, ffn, bias=False),
        "ffn_r": linear_init(keys[5], d, d, bias=False),
        "ffn_v": linear_init(keys[6], ffn, d, bias=False),
    }


def _wkv_scan(w, u, k, v):
    """RWKV WKV recurrence over time: (B, T, D) k/v -> (B, T, D) weighted values.

    state = (num, den, max_exp) carried in log-space-stable form.
    """
    decay = -jnp.exp(w)  # (D,) negative decay per channel

    def step(carry, kv_t):
        num, den, m = carry
        k_t, v_t = kv_t
        # output uses bonus u for the current token
        mo = jnp.maximum(m, u + k_t)
        out_num = num * jnp.exp(m - mo) + jnp.exp(u + k_t - mo) * v_t
        out_den = den * jnp.exp(m - mo) + jnp.exp(u + k_t - mo)
        y = out_num / jnp.maximum(out_den, 1e-9)
        # state update with decay
        m2 = jnp.maximum(m + decay, k_t)
        num2 = num * jnp.exp(m + decay - m2) + jnp.exp(k_t - m2) * v_t
        den2 = den * jnp.exp(m + decay - m2) + jnp.exp(k_t - m2)
        return (num2, den2, m2), y

    b, t, d = k.shape
    init = (jnp.zeros((b, d)), jnp.zeros((b, d)), jnp.full((b, d), -1e30))
    _, ys = jax.lax.scan(step, init, (k.swapaxes(0, 1), v.swapaxes(0, 1)))
    return ys.swapaxes(0, 1)


def _rwkv_block_apply(p, x):
    h = layer_norm_apply(p["ln1"], x)
    r = jax.nn.sigmoid(linear_apply(p["r_proj"], h))
    k = linear_apply(p["k_proj"], h).astype(jnp.float32)
    v = linear_apply(p["v_proj"], h).astype(jnp.float32)
    wkv = _wkv_scan(p["time_decay"], p["time_first"], k, v).astype(x.dtype)
    x = x + linear_apply(p["o_proj"], r * wkv)
    h = layer_norm_apply(p["ln2"], x)
    kf = jnp.square(jax.nn.relu(linear_apply(p["ffn_k"], h)))
    rf = jax.nn.sigmoid(linear_apply(p["ffn_r"], h))
    return x + rf * linear_apply(p["ffn_v"], kf)


@tables.register("encoder_classes", "RWKVEncoder")
class RWKVEncoder:
    def __init__(self, input_size: int, output_size: int = 256,
                 num_blocks: int = 6, ffn_mult: int = 4, **kwargs):
        self.cfg = RWKVConfig(input_size, output_size, num_blocks, ffn_mult)

    def output_size(self):
        return self.cfg.output_size

    def init(self, rng):
        cfg = self.cfg
        keys = jax.random.split(rng, cfg.num_blocks + 2)
        return {
            "embed": linear_init(keys[0], cfg.input_size, cfg.output_size),
            "blocks": stack_params([
                _rwkv_block_init(keys[1 + i], cfg.output_size,
                                 cfg.output_size * cfg.ffn_mult)
                for i in range(cfg.num_blocks)]),
            "after_norm": layer_norm_init(cfg.output_size),
        }

    def __call__(self, params, xs_pad, ilens, rng=None):
        x = linear_apply(params["embed"], xs_pad)

        def body(carry, lp):
            return _rwkv_block_apply(lp, carry), None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        x = layer_norm_apply(params["after_norm"], x)
        mask = make_pad_mask(ilens, x.shape[1])
        return x * mask[..., None].astype(x.dtype), ilens


@tables.register("model_classes", "BAT")
@tables.register("model_classes", "RWKVBAT")
class BAT:
    """Boundary-aware transducer: Transducer with an RWKV (or any) encoder whose
    joint lattice is restricted to a band around predicted boundaries
    (reference ``funasr/models/bat/``). Band restriction here = full RNN-T loss
    (exact superset); the band optimization lands with the pallas lattice kernel."""

    def __new__(cls, encoder: str = "RWKVEncoder", **kwargs):
        from funasr_tpu.models.transducer.model import Transducer
        return Transducer(encoder=encoder, **kwargs)


@tables.register("model_classes", "ConformerRWKV")
class ConformerRWKV:
    def __new__(cls, encoder: str = "RWKVEncoder", **kwargs):
        from funasr_tpu.models.transformer.model import Transformer
        return Transformer(encoder=encoder, **kwargs)
