"""Conformer encoder (macaron FFN + rel-pos MHSA + conv module, espnet lineage).

TPU-native rebuild of FunASR ``funasr/models/conformer/encoder.py:286+``
(ConvolutionModule ``:53``: pointwise -> GLU -> depthwise(k=15) -> BN -> swish ->
pointwise; EncoderLayer with macaron 0.5-scaled FFNs and final norm).
"""

from __future__ import annotations

from typing import NamedTuple

from functools import partial

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    conv1d_init, depthwise_conv1d_init, ffn_init, layer_norm_apply, layer_norm_init,
    linear_apply, make_pad_mask)
from funasr_tpu.core.module import stack_params
from funasr_tpu.models.campplus.components import batchnorm_apply, batchnorm_init
from funasr_tpu.core.layers import conv1d_apply, depthwise_conv1d_apply
from funasr_tpu.models.transformer.attention import (
    MHAConfig, rel_pos_emb, relpos_mha_apply, relpos_mha_init)
from funasr_tpu.models.transformer.subsampling import (
    conv2d_subsampling_apply, conv2d_subsampling_init)
from funasr_tpu.register import tables


def swish(x):
    return x * jax.nn.sigmoid(x)


class ConformerConfig(NamedTuple):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    cnn_module_kernel: int = 15
    macaron_style: bool = True
    input_layer: str = "conv2d"

    @property
    def mha(self):
        return MHAConfig(self.attention_heads, self.output_size)


def conv_module_init(rng, channels: int, kernel: int):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "pointwise_conv1": conv1d_init(k1, channels, 2 * channels, 1),
        "depthwise_conv": depthwise_conv1d_init(k2, channels, kernel, bias=True),
        "norm": batchnorm_init(channels),
        "pointwise_conv2": conv1d_init(k3, channels, channels, 1),
    }


def conv_module_apply(params, x, kernel: int):
    h = conv1d_apply(params["pointwise_conv1"], x)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # GLU
    pad = (kernel - 1) // 2
    h = depthwise_conv1d_apply(params["depthwise_conv"], h, left_pad=pad,
                               right_pad=pad)
    h = swish(batchnorm_apply(params["norm"], h))
    return conv1d_apply(params["pointwise_conv2"], h)


def _ffn_swish(params, x):
    h = swish(linear_apply(params["w_1"], x))
    return linear_apply(params["w_2"], h)


def _layer_init(rng, cfg: ConformerConfig):
    keys = jax.random.split(rng, 4)
    d = cfg.output_size
    p = {
        "norm_ff": layer_norm_init(d),
        "norm_mha": layer_norm_init(d),
        "norm_conv": layer_norm_init(d),
        "norm_final": layer_norm_init(d),
        "self_attn": relpos_mha_init(keys[0], cfg.mha),
        "feed_forward": ffn_init(keys[1], d, cfg.linear_units),
        "conv_module": conv_module_init(keys[2], d, cfg.cnn_module_kernel),
    }
    if cfg.macaron_style:
        p["norm_ff_macaron"] = layer_norm_init(d)
        p["feed_forward_macaron"] = ffn_init(keys[3], d, cfg.linear_units)
    return p


def _layer_apply(params, cfg: ConformerConfig, x, pos_emb, mask):
    if cfg.macaron_style:
        h = layer_norm_apply(params["norm_ff_macaron"], x)
        x = x + 0.5 * _ffn_swish(params["feed_forward_macaron"], h)
    h = layer_norm_apply(params["norm_mha"], x)
    x = x + relpos_mha_apply(params["self_attn"], cfg.mha, h, pos_emb,
                             mask[:, None, :])
    h = layer_norm_apply(params["norm_conv"], x)
    x = x + conv_module_apply(params["conv_module"], h, cfg.cnn_module_kernel)
    h = layer_norm_apply(params["norm_ff"], x)
    x = x + 0.5 * _ffn_swish(params["feed_forward"], h)
    return layer_norm_apply(params["norm_final"], x)


@tables.register("encoder_classes", "ConformerEncoder")
class ConformerEncoder:
    def __init__(self, input_size: int, output_size: int = 256,
                 attention_heads: int = 4, linear_units: int = 2048,
                 num_blocks: int = 6, cnn_module_kernel: int = 15,
                 macaron_style: bool = True, input_layer: str = "conv2d", **kwargs):
        self.cfg = ConformerConfig(input_size, output_size, attention_heads,
                                   linear_units, num_blocks, cnn_module_kernel,
                                   macaron_style, input_layer)

    def output_size(self):
        return self.cfg.output_size

    def init(self, rng):
        cfg = self.cfg
        keys = jax.random.split(rng, cfg.num_blocks + 2)
        params = {
            "encoders": stack_params([
                _layer_init(keys[i], cfg) for i in range(cfg.num_blocks)]),
            "after_norm": layer_norm_init(cfg.output_size),
        }
        if cfg.input_layer == "conv2d":
            params["embed"] = conv2d_subsampling_init(keys[-1], cfg.input_size,
                                                      cfg.output_size)
        return params

    def __call__(self, params, xs_pad, ilens, rng=None):
        cfg = self.cfg
        if cfg.input_layer == "conv2d":
            x, olens = conv2d_subsampling_apply(params["embed"], xs_pad, ilens,
                                                add_pe=False)
            x = x * (cfg.output_size ** 0.5)
        else:
            x, olens = xs_pad, ilens
        mask = make_pad_mask(olens, x.shape[1])
        pos = rel_pos_emb(x.shape[1], cfg.output_size, x.dtype)

        def body(carry, lp):
            return _layer_apply(lp, cfg, carry, pos, mask), None

        x, _ = jax.lax.scan(body, x, params["encoders"])
        x = layer_norm_apply(params["after_norm"], x)
        return x, olens


# ---------------------------------------------------------------------------
# chunked (streaming) conformer
# ---------------------------------------------------------------------------


def chunk_attention_mask(t: int, chunk_size: int, left_chunks: int):
    """(1, T, T) bool: frame q attends to k iff chunk(k) <= chunk(q) and
    chunk(q) - chunk(k) <= left_chunks (wenet/espnet chunk-causal convention;
    left_chunks < 0 = unlimited left context)."""
    ci = jnp.arange(t) // chunk_size
    dq = ci[:, None] - ci[None, :]
    allowed = dq >= 0
    if left_chunks >= 0:
        allowed = allowed & (dq <= left_chunks)
    return allowed[None]


def _chunk_layer_apply(params, cfg: ConformerConfig, x, pos_emb, attn_mask,
                       pad_mask):
    """Conformer layer with an explicit (B|1, T, T) attention mask and a CAUSAL
    conv module (left-only padding) so offline and chunked streaming results
    agree."""
    if cfg.macaron_style:
        h = layer_norm_apply(params["norm_ff_macaron"], x)
        x = x + 0.5 * _ffn_swish(params["feed_forward_macaron"], h)
    h = layer_norm_apply(params["norm_mha"], x)
    x = x + relpos_mha_apply(params["self_attn"], cfg.mha, h, pos_emb, attn_mask)
    h = layer_norm_apply(params["norm_conv"], x)
    h = h * pad_mask[..., None].astype(h.dtype)
    hc = conv1d_apply(params["conv_module"]["pointwise_conv1"], h)
    a, b = jnp.split(hc, 2, axis=-1)
    hc = a * jax.nn.sigmoid(b)
    # invalid frames must contribute literal zeros to the depthwise taps
    # (pointwise bias + GLU makes them nonzero otherwise)
    hc = hc * pad_mask[..., None].astype(hc.dtype)
    hc = depthwise_conv1d_apply(params["conv_module"]["depthwise_conv"], hc,
                                left_pad=cfg.cnn_module_kernel - 1, right_pad=0)
    hc = swish(batchnorm_apply(params["conv_module"]["norm"], hc))
    x = x + conv1d_apply(params["conv_module"]["pointwise_conv2"], hc)
    h = layer_norm_apply(params["norm_ff"], x)
    x = x + 0.5 * _ffn_swish(params["feed_forward"], h)
    return layer_norm_apply(params["norm_final"], x)


@partial(jax.jit, static_argnames=("self",))
def _conformer_chunk_jit(self, params, chunk, k_all, v_all, conv_all, filled):
    return self._forward_chunk_impl(params, chunk, k_all, v_all, conv_all,
                                    filled)


@tables.register("encoder_classes", "ChunkConformerEncoder")
class ChunkConformerEncoder(ConformerEncoder):
    """Chunk-causal conformer for streaming (cache-based stateful inference,
    arXiv 2312.17279 pattern; registered name from the reference's
    ``ChunkConformerEncoder``). Offline ``__call__`` applies the block-causal
    chunk mask + causal conv so training matches streaming exactly;
    ``forward_chunk`` carries per-layer hidden/conv caches of
    ``left_chunks * chunk_size`` frames."""

    def __init__(self, *args, chunk_size: int = 16, left_chunks: int = 4,
                 **kwargs):
        kwargs.setdefault("input_layer", "null")
        super().__init__(*args, **kwargs)
        self.chunk_size = chunk_size
        self.left_chunks = left_chunks

    def __call__(self, params, xs_pad, ilens, rng=None, chunk_size=None,
                 left_chunks=None):
        cfg = self.cfg
        cs = chunk_size or self.chunk_size
        lc = self.left_chunks if left_chunks is None else left_chunks
        if cfg.input_layer == "conv2d":
            x, olens = conv2d_subsampling_apply(params["embed"], xs_pad, ilens,
                                                add_pe=False)
            x = x * (cfg.output_size ** 0.5)
        else:
            x, olens = xs_pad, ilens
        t = x.shape[1]
        pad_mask = make_pad_mask(olens, t)
        attn_mask = chunk_attention_mask(t, cs, lc) & pad_mask[:, None, :]
        pos = rel_pos_emb(t, cfg.output_size, x.dtype)

        def body(carry, lp):
            return _chunk_layer_apply(lp, cfg, carry, pos, attn_mask,
                                      pad_mask), None

        x, _ = jax.lax.scan(body, x, params["encoders"])
        x = layer_norm_apply(params["after_norm"], x)
        return x * pad_mask[..., None].astype(x.dtype), olens

    # -- streaming ------------------------------------------------------------
    # Exact O(1)-state streaming: per layer, cache the last left_chunks*cs
    # attention keys/values and the last (kernel-1) post-GLU conv inputs —
    # the quantities the offline pass would read from evicted frames. Matches
    # the offline chunk-masked forward bit-for-bit (tests/test_chunk_conformer).

    def init_cache(self, batch: int, dtype=jnp.float32):
        cfg = self.cfg
        l = self.left_chunks * self.chunk_size
        h, dk = cfg.attention_heads, cfg.output_size // cfg.attention_heads
        # stacked (num_blocks, ...) so the jitted chunk step scans layers
        return {
            "k": jnp.zeros((cfg.num_blocks, batch, h, l, dk), dtype),
            "v": jnp.zeros((cfg.num_blocks, batch, h, l, dk), dtype),
            "conv": jnp.zeros((cfg.num_blocks, batch,
                               cfg.cnn_module_kernel - 1, cfg.output_size),
                              dtype),
            "filled": jnp.zeros((batch,), jnp.int32),
        }

    def _attn_step(self, lp, x_chunk, k_cache, v_cache, valid_left):
        """Rel-pos attention: queries = chunk, keys = [cache | chunk]."""
        from funasr_tpu.core.layers import linear_apply, masked_softmax
        import math
        cfg = self.cfg.mha
        b, cs, _ = x_chunk.shape
        l = k_cache.shape[2]

        def heads(y):
            return y.reshape(b, -1, cfg.n_head, cfg.d_k).transpose(0, 2, 1, 3)

        q = heads(linear_apply(lp["linear_q"], x_chunk))
        k_new = heads(linear_apply(lp["linear_k"], x_chunk))
        v_new = heads(linear_apply(lp["linear_v"], x_chunk))
        k = jnp.concatenate([k_cache, k_new], axis=2)  # (B, H, l+cs, dk)
        v = jnp.concatenate([v_cache, v_new], axis=2)
        t = l + cs
        q_u = q + lp["pos_bias_u"].astype(q.dtype)[None, :, None, :]
        q_v = q + lp["pos_bias_v"].astype(q.dtype)[None, :, None, :]
        ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                        preferred_element_type=jnp.float32)
        # relative-position term via explicit distance gather: the espnet
        # table rows are distances t-1 .. -(t-1)
        pe = rel_pos_emb(t, self.cfg.output_size, x_chunk.dtype)  # (1, 2t-1, D)
        p = linear_apply(lp["linear_pos"], pe).reshape(
            1, 2 * t - 1, cfg.n_head, cfg.d_k).transpose(0, 2, 1, 3)
        bd_all = jnp.einsum("bhqd,bhnd->bhqn", q_v, p,
                            preferred_element_type=jnp.float32)
        qpos = l + jnp.arange(cs)
        kpos = jnp.arange(t)
        idx = (t - 1) - (qpos[:, None] - kpos[None, :])  # distance -> table row
        bd = jnp.take_along_axis(
            bd_all, jnp.broadcast_to(idx[None, None], bd_all.shape[:2] + idx.shape),
            axis=-1)
        scores = (ac + bd) / math.sqrt(cfg.d_k)
        key_valid = kpos[None] >= (l - valid_left)[:, None]  # (B, t)
        attn = masked_softmax(scores.astype(x_chunk.dtype),
                              key_valid[:, None, None, :])
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32)
        out = ctx.transpose(0, 2, 1, 3).reshape(b, cs, -1).astype(x_chunk.dtype)
        out = linear_apply(lp["linear_out"], out)
        keep = self.left_chunks * self.chunk_size
        return out, k[:, :, -keep:] if keep else k[:, :, :0], \
            v[:, :, -keep:] if keep else v[:, :, :0]

    def forward_chunk(self, params, chunk, cache):
        """chunk: (B, chunk_size, D) post-subsampling -> (B, chunk_size, D).

        One jitted program per chunk (cache shapes are fixed from init, so
        the whole stream reuses a single compile): lax.scan over the stacked
        layers with the stacked k/v/conv caches — the eager per-layer loop
        cost hundreds of dispatches per chunk.
        """
        y, new_k, new_v, new_conv = _conformer_chunk_jit(
            self, params, chunk, cache["k"], cache["v"], cache["conv"],
            cache["filled"])
        return y, {"k": new_k, "v": new_v, "conv": new_conv,
                   "filled": cache["filled"] + chunk.shape[1]}

    def _forward_chunk_impl(self, params, chunk, k_all, v_all, conv_all,
                            filled):
        cfg = self.cfg
        x = chunk
        valid_left = jnp.minimum(filled, self.left_chunks * self.chunk_size)

        def body(x, inp):
            lp, k_c, v_c, conv_c = inp
            if cfg.macaron_style:
                h = layer_norm_apply(lp["norm_ff_macaron"], x)
                x = x + 0.5 * _ffn_swish(lp["feed_forward_macaron"], h)
            h = layer_norm_apply(lp["norm_mha"], x)
            attn_out, new_k, new_v = self._attn_step(
                lp["self_attn"], h, k_c, v_c, valid_left)
            x = x + attn_out
            h = layer_norm_apply(lp["norm_conv"], x)
            hc = conv1d_apply(lp["conv_module"]["pointwise_conv1"], h)
            a2, b2 = jnp.split(hc, 2, axis=-1)
            hc = a2 * jax.nn.sigmoid(b2)
            win = jnp.concatenate([conv_c, hc], axis=1)
            new_conv = win[:, -(cfg.cnn_module_kernel - 1):]
            hd = depthwise_conv1d_apply(lp["conv_module"]["depthwise_conv"],
                                        win, left_pad=0, right_pad=0)
            hd = swish(batchnorm_apply(lp["conv_module"]["norm"], hd))
            x = x + conv1d_apply(lp["conv_module"]["pointwise_conv2"], hd)
            h = layer_norm_apply(lp["norm_ff"], x)
            x = x + 0.5 * _ffn_swish(lp["feed_forward"], h)
            x = layer_norm_apply(lp["norm_final"], x)
            return x, (new_k, new_v, new_conv)

        x, (new_k, new_v, new_conv) = jax.lax.scan(
            body, x, (params["encoders"], k_all, v_all, conv_all))
        x = layer_norm_apply(params["after_norm"], x)
        return x, new_k, new_v, new_conv
