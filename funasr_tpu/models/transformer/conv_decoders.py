"""Lightweight / dynamic convolution transformer decoders (fairseq "Pay Less
Attention" family).

TPU-native rebuilds of FunASR ``funasr/models/transformer/decoder.py:461-775``
(Lightweight/Dynamic Convolution(2D)TransformerDecoder) and the conv modules
``transformer/utils/{lightconv,lightconv2d,dynamic_conv,dynamic_conv2d}.py``:
the decoder self-attention is replaced by

- lightweight conv: GLU(linear1(x)) -> causal depthwise conv whose k-tap kernel
  is SHARED across C/wshare channel groups and softmax-normalized -> linear2;
- dynamic conv: same, but the per-position kernel is generated from the input
  by a linear layer (``linear_weight``), softmaxed over taps;
- the "2D" variants prepend a frequency-axis (feature) conv with a second
  shared kernel (reference lightconv2d ``weight_f``).

Cross-attention and FFN stay standard. The convs are implemented as k shifted
fused multiply-adds (VPU-friendly, like core depthwise_conv1d) instead of
grouped conv lowering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    embedding_apply,
    embedding_init,
    ffn_apply,
    ffn_init,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    make_pad_mask,
)
from funasr_tpu.core.module import stack_params
from funasr_tpu.models.transformer.attention import add_espnet_pe, mha_apply, mha_init
from funasr_tpu.models.transformer.decoder import (
    TransformerDecoder,
    TransformerDecoderConfig,
)
from funasr_tpu.register import tables


def _glu(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


def _shared_kernel_conv(x, w, causal: bool):
    """x: (B, T, C); w: (H, k) group-shared taps (softmaxed by caller).

    Tap i reads input position t + i - k//2 (torch conv1d, padding=k//2);
    causal masks taps with i > k//2 before the softmax (done by caller).
    """
    b, t, c = x.shape
    h, k = w.shape
    group = c // h
    pad = k // 2
    xpad = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    # channel c shares head c % h (torch view(-1, H, T) interleaves heads)
    w_full = jnp.tile(w.T, (1, group))  # (k, C)
    out = jnp.zeros_like(x)
    for i in range(k):
        out = out + xpad[:, i:i + t, :] * w_full[i][None, None, :]
    return out


def _softmax_taps(weight, k: int, causal: bool):
    """(H, k) raw taps -> softmax over taps, causal-masked (keep i <= k//2)."""
    if causal:
        taps = jnp.arange(k)
        weight = jnp.where((taps <= k // 2)[None, :], weight, -jnp.inf)
    return jax.nn.softmax(weight.astype(jnp.float32), axis=-1)


def lightweight_conv_init(rng, dim: int, wshare: int, kernel: int,
                          freq_conv: bool):
    keys = jax.random.split(rng, 4)
    p = {
        "linear1": linear_init(keys[0], dim, dim * 2),
        "linear2": linear_init(keys[1], dim, dim),
        "weight": jax.random.uniform(keys[2], (wshare, kernel)),
    }
    if freq_conv:
        p["weight_f"] = jax.random.uniform(keys[3], (wshare, kernel))
    return p


def lightweight_conv_apply(p, x, wshare: int, kernel: int, causal: bool = True):
    h = _glu(linear_apply(p["linear1"], x))
    if "weight_f" in p:
        # frequency-axis conv (2D variant): shared k-tap kernel per feature
        # group, convolved along the C axis (reference lightconv2d weight_f)
        b, t, c = h.shape
        hh, k = p["weight_f"].shape
        group = c // hh
        wf = jax.nn.softmax(p["weight_f"].astype(jnp.float32), axis=-1)
        pad_f = k // 2
        hpad_f = jnp.pad(h, ((0, 0), (0, 0), (pad_f, pad_f)))
        head = jnp.arange(c) // group
        acc = jnp.zeros_like(h)
        for i in range(k):
            acc = acc + hpad_f[:, :, i:i + c] * wf[head, i].astype(h.dtype)
        h = acc
    w = _softmax_taps(p["weight"], kernel, causal)
    out = _shared_kernel_conv(h, w, causal)
    return linear_apply(p["linear2"], out)


def dynamic_conv_init(rng, dim: int, wshare: int, kernel: int, freq_conv: bool):
    keys = jax.random.split(rng, 5)
    p = {
        "linear1": linear_init(keys[0], dim, dim * 2),
        "linear2": linear_init(keys[1], dim, dim),
        "linear_weight": linear_init(keys[2], dim, wshare * kernel),
    }
    if freq_conv:
        p["linear_weight_f"] = linear_init(keys[3], dim, wshare * kernel)
    return p


def dynamic_conv_apply(p, x, wshare: int, kernel: int, causal: bool = True):
    b, t, c = x.shape
    group = c // wshare
    pad = kernel // 2
    h = _glu(linear_apply(p["linear1"], x))
    if "linear_weight_f" in p:
        # 2D variant: per-position kernel convolved along the feature axis
        wf = jax.nn.softmax(
            linear_apply(p["linear_weight_f"], h)
            .reshape(b, t, wshare, kernel).astype(jnp.float32), axis=-1)
        hpad_f = jnp.pad(h, ((0, 0), (0, 0), (pad, pad)))
        acc = jnp.zeros_like(h)
        head = jnp.arange(c) // group  # feature -> shared-kernel head
        for i in range(kernel):
            acc = acc + hpad_f[:, :, i:i + c] * \
                wf[:, :, head, i].astype(h.dtype)
        h = acc
    # per-position kernels from the GLU output (reference dynamic_conv.py:90
    # computes linear_weight AFTER the GLU).
    # Tap i reads position t + i - pad; out-of-range taps (sequence start, and
    # the future under the causal mask) get -inf BEFORE the softmax so boundary
    # positions renormalize over their real support — the reference builds the
    # banded T x T matrix (-inf filled) and tril-masks it, same semantics.
    w = linear_apply(p["linear_weight"], h).reshape(b, t, wshare, kernel)
    taps = jnp.arange(kernel)[None, None, None, :]
    t_idx = jnp.arange(t)[None, :, None, None]
    valid = (t_idx + taps - pad) >= 0
    if causal:
        valid = valid & (taps <= pad)
    w = jnp.where(valid, w, -jnp.inf)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1)
    hpad = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
    hg = hpad.reshape(b, t + 2 * pad, wshare, group)
    out = jnp.zeros((b, t, wshare, group), h.dtype)
    for i in range(kernel):
        out = out + hg[:, i:i + t] * w[..., i][..., None].astype(h.dtype)
    return linear_apply(p["linear2"], out.reshape(b, t, c))


def _conv_dec_layer_init(rng, cfg, conv_kind: str, wshare: int, kernel: int,
                         freq: bool):
    k1, k2, k3 = jax.random.split(rng, 3)
    init = lightweight_conv_init if conv_kind == "light" else dynamic_conv_init
    return {"norm1": layer_norm_init(cfg.dim), "norm2": layer_norm_init(cfg.dim),
            "norm3": layer_norm_init(cfg.dim),
            "self_conv": init(k1, cfg.dim, wshare, kernel, freq),
            "src_attn": mha_init(k2, cfg.mha),
            "feed_forward": ffn_init(k3, cfg.dim, cfg.linear_units)}


class _ConvTransformerDecoder(TransformerDecoder):
    CONV_KIND = "light"
    FREQ = False

    def __init__(self, vocab_size: int, encoder_output_size: int,
                 attention_heads: int = 4, linear_units: int = 2048,
                 num_blocks: int = 6, conv_wshare: int = 4,
                 conv_kernel_length=(11, 11, 11, 11, 11, 11), **kwargs):
        super().__init__(vocab_size, encoder_output_size, attention_heads,
                         linear_units, num_blocks, **kwargs)
        self.wshare = conv_wshare
        ks = conv_kernel_length
        self.kernels = list(ks)[:num_blocks] if not isinstance(ks, int) \
            else [ks] * num_blocks
        while len(self.kernels) < num_blocks:
            self.kernels.append(self.kernels[-1])

    def init(self, rng):
        cfg = self.cfg
        keys = jax.random.split(rng, cfg.num_blocks + 2)
        return {
            "embed": embedding_init(keys[0], cfg.vocab_size, cfg.dim),
            # per-layer kernel sizes may differ -> plain list, no scan stack
            "decoders": [
                _conv_dec_layer_init(keys[1 + i], cfg, self.CONV_KIND,
                                     self.wshare, self.kernels[i], self.FREQ)
                for i in range(cfg.num_blocks)],
            "after_norm": layer_norm_init(cfg.dim),
            "output_layer": linear_init(keys[-1], cfg.dim, cfg.vocab_size),
        }

    def _run(self, params, ys, tgt_mask, memory, memory_mask):
        cfg = self.cfg
        apply = (lightweight_conv_apply if self.CONV_KIND == "light"
                 else dynamic_conv_apply)
        x = add_espnet_pe(embedding_apply(params["embed"], ys, dtype=memory.dtype))
        pad_valid = tgt_mask[:, -1, :] if tgt_mask is not None else None
        for li, lp in enumerate(params["decoders"]):
            residual = x
            h = layer_norm_apply(lp["norm1"], x)
            h = apply(lp["self_conv"], h, self.wshare, self.kernels[li])
            if pad_valid is not None:
                h = h * pad_valid[..., None].astype(h.dtype)
            x = residual + h
            residual = x
            h = layer_norm_apply(lp["norm2"], x)
            x = residual + mha_apply(lp["src_attn"], cfg.mha, h, memory, memory,
                                     memory_mask[:, None, :])
            residual = x
            h = layer_norm_apply(lp["norm3"], x)
            x = residual + ffn_apply(lp["feed_forward"], h)
        x = layer_norm_apply(params["after_norm"], x)
        return linear_apply(params["output_layer"], x)


@tables.register("decoder_classes", "LightweightConvolutionTransformerDecoder")
class LightweightConvolutionTransformerDecoder(_ConvTransformerDecoder):
    CONV_KIND, FREQ = "light", False


@tables.register("decoder_classes", "LightweightConvolution2DTransformerDecoder")
class LightweightConvolution2DTransformerDecoder(_ConvTransformerDecoder):
    CONV_KIND, FREQ = "light", True


@tables.register("decoder_classes", "DynamicConvolutionTransformerDecoder")
class DynamicConvolutionTransformerDecoder(_ConvTransformerDecoder):
    CONV_KIND, FREQ = "dyn", False


@tables.register("decoder_classes", "DynamicConvolution2DTransformerDecoder")
class DynamicConvolution2DTransformerDecoder(_ConvTransformerDecoder):
    CONV_KIND, FREQ = "dyn", True
