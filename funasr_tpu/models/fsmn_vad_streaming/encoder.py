"""FSMN scoring encoder for VAD.

TPU-native rebuild of the reference encoder (FunASR ``funasr/models/fsmn_vad_streaming/
encoder.py``: ``FSMNBlock:75-145`` depthwise memory conv with separate causal-left /
lookahead-right kernels; ``BasicBlock:148`` linear -> fsmn -> affine -> relu;
``FSMN:258-340`` in_linear1/2 + N blocks + out_linear1/2 + softmax).

Streaming keeps, per layer, the last ``(lorder-1)*lstride`` projected frames as the
causal-conv left context — fixed-shape carry arrays, jit-friendly.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

from functools import partial

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    depthwise_conv1d_apply,
    depthwise_conv1d_init,
    linear_apply,
    linear_init,
)
from funasr_tpu.register import tables


class FSMNConfig(NamedTuple):
    input_dim: int = 400
    input_affine_dim: int = 140
    fsmn_layers: int = 4
    linear_dim: int = 250
    proj_dim: int = 128
    lorder: int = 20
    rorder: int = 0
    lstride: int = 1
    rstride: int = 1
    output_affine_dim: int = 140
    output_dim: int = 248
    use_softmax: bool = True


@partial(jax.jit, static_argnames=("self",))
def _fsmn_forward_jit(self, params, x, caches):
    return self._forward_impl(params, x, caches)


@tables.register("encoder_classes", "FSMN")
class FSMN:
    def __init__(self, input_dim: int, input_affine_dim: int, fsmn_layers: int,
                 linear_dim: int, proj_dim: int, lorder: int, rorder: int,
                 lstride: int, rstride: int, output_affine_dim: int, output_dim: int,
                 use_softmax: bool = True, **kwargs):
        assert lstride == 1 and (rorder == 0 or rstride == 1), \
            "dilated FSMN strides not yet supported"
        self.cfg = FSMNConfig(input_dim, input_affine_dim, fsmn_layers, linear_dim,
                              proj_dim, lorder, rorder, lstride, rstride,
                              output_affine_dim, output_dim, use_softmax)

    def output_size(self) -> int:
        return self.cfg.output_dim

    def init(self, rng):
        c = self.cfg
        keys = jax.random.split(rng, 4 + 3 * c.fsmn_layers)
        params = {
            "in_linear1": linear_init(keys[0], c.input_dim, c.input_affine_dim),
            "in_linear2": linear_init(keys[1], c.input_affine_dim, c.linear_dim),
            "out_linear1": linear_init(keys[2], c.linear_dim, c.output_affine_dim),
            "out_linear2": linear_init(keys[3], c.output_affine_dim, c.output_dim),
            "fsmn": [],
        }
        for i in range(c.fsmn_layers):
            k0, k1, k2 = keys[4 + 3 * i : 7 + 3 * i]
            block = {
                "linear": linear_init(k0, c.linear_dim, c.proj_dim, bias=False),
                "conv_left": depthwise_conv1d_init(k1, c.proj_dim, c.lorder),
                "affine": linear_init(k2, c.proj_dim, c.linear_dim),
            }
            if c.rorder > 0:
                block["conv_right"] = depthwise_conv1d_init(
                    jax.random.fold_in(k1, 1), c.proj_dim, c.rorder)
            params["fsmn"].append(block)
        return params

    def _block(self, bp, x, cache_x=None):
        """One BasicBlock. ``cache_x``: (B, lorder-1, proj) left context or None."""
        c = self.cfg
        h = linear_apply(bp["linear"], x)  # (B, T, proj)
        if cache_x is not None:
            full = jnp.concatenate([cache_x, h], axis=1)
            left = depthwise_conv1d_apply(bp["conv_left"], full, left_pad=0, right_pad=0)
            new_cache = full[:, -(c.lorder - 1):] if c.lorder > 1 else cache_x
        else:
            left = depthwise_conv1d_apply(bp["conv_left"], h,
                                          left_pad=c.lorder - 1, right_pad=0)
            new_cache = None
        out = h + left
        if c.rorder > 0:
            # lookahead: conv over frames t+1 .. t+rorder
            right = depthwise_conv1d_apply(bp["conv_right"], h[:, 1:],
                                           left_pad=0, right_pad=c.rorder)
            out = out + right
        out = linear_apply(bp["affine"], out)
        out = jax.nn.relu(out)
        return out, new_cache

    def __call__(self, params, x, cache: Optional[Dict] = None):
        """x: (B, T, input_dim) -> (B, T, output_dim) softmax scores.

        ``cache``: dict carrying per-layer left contexts across streaming chunks
        (mutated in place, mirrors the reference cache_layer_i contract). The
        whole scoring stack runs as ONE jitted program — the eager per-op
        dispatch dominated streaming VAD latency over the device tunnel.
        """
        c = self.cfg
        n = len(params["fsmn"])
        if cache is not None:
            for i in range(n):
                key = f"cache_layer_{i}"
                if key not in cache:
                    cache[key] = jnp.zeros(
                        (x.shape[0], (c.lorder - 1) * c.lstride, c.proj_dim),
                        x.dtype)
            caches = tuple(cache[f"cache_layer_{i}"] for i in range(n))
        else:
            caches = None
        h, new_caches = _fsmn_forward_jit(self, params, jnp.asarray(x), caches)
        if cache is not None:
            for i in range(n):
                cache[f"cache_layer_{i}"] = new_caches[i]
        return h

    def _forward_impl(self, params, x, caches):
        c = self.cfg
        h = linear_apply(params["in_linear1"], x)
        h = linear_apply(params["in_linear2"], h)
        h = jax.nn.relu(h)
        new_caches = []
        for i, bp in enumerate(params["fsmn"]):
            h, new_c = self._block(bp, h, caches[i] if caches is not None
                                   else None)
            new_caches.append(new_c)
        h = linear_apply(params["out_linear1"], h)
        h = linear_apply(params["out_linear2"], h)
        if c.use_softmax:
            h = jax.nn.softmax(h.astype(jnp.float32), axis=-1)
        return h, tuple(new_caches)
