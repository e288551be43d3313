"""MFCCA encoder: multi-frame cross-channel attention conformer.

TPU-native rebuild of FunASR ``funasr/models/mfcca/mfcca_encoder.py:104`` +
``encoder_layer_mfcca.py:166``: every block first lets each frame's channel
vectors attend over a 5-frame window of all channels (multi-frame cross-channel
attention), then runs a conformer layer (legacy relative-position self
attention over time + GLU conv module + FFN). After the blocks, a 4-conv 2-D
stack fuses the (padded-to-8) channel dim down to one stream.

Layouts: sequences (B*C, T, D); the 5-frame window keys are built with one pad
+ static stack (no per-window python loop), so the whole block jits to a single
fused attention over (B*T, C) x (B*T, 5C).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    conv1d_init, ffn_init, layer_norm_apply, layer_norm_init, linear_apply,
    linear_init, make_pad_mask, masked_softmax)
from funasr_tpu.models.campplus.components import (
    batchnorm_apply, batchnorm_init, conv2d_init)
from funasr_tpu.models.transformer.subsampling import (
    conv2d_subsampling_apply, conv2d_subsampling_init)
from funasr_tpu.register import tables


def swish(x):
    return x * jax.nn.sigmoid(x)


def legacy_rel_pe(t: int, d: int, dtype=jnp.float32, max_len: int = 5000):
    """LegacyRelPositionalEncoding table slice (ref ``transformer/embedding.py:216``):
    the reference builds a ``max_len`` REVERSED position table once and slices
    its first ``t`` rows, i.e. positions (max_len-1, ..., max_len-t)."""
    pos = jnp.arange(max_len - 1, max_len - 1 - t, -1, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d, 2, dtype=jnp.float32)
                  * -(math.log(10000.0) / d))
    pe = jnp.zeros((t, d), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe.astype(dtype)


# -- attention variants ------------------------------------------------------


def _mha_init(rng, d: int):
    ks = jax.random.split(rng, 4)
    return {n: linear_init(k, d, d) for n, k in
            zip(("linear_q", "linear_k", "linear_v", "linear_out"), ks)}


def _heads(z, h):
    b, t, d = z.shape
    return z.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)


def _mha_apply(p, q_in, kv_in, n_head: int, mask=None):
    """espnet MultiHeadedAttention (ref ``transformer/attention.py:21``)."""
    d = q_in.shape[-1]
    q = _heads(linear_apply(p["linear_q"], q_in), n_head)
    k = _heads(linear_apply(p["linear_k"], kv_in), n_head)
    v = _heads(linear_apply(p["linear_v"], kv_in), n_head)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) \
        / math.sqrt(d // n_head)
    if mask is None:
        att = jax.nn.softmax(scores, axis=-1)
    else:
        att = masked_softmax(scores, mask)
    out = jnp.einsum("bhqk,bhkd->bhqd", att.astype(q_in.dtype), v)
    b, h, t, dk = out.shape
    return linear_apply(p["linear_out"], out.transpose(0, 2, 1, 3)
                        .reshape(b, t, h * dk))


def legacy_relpos_mha_init(rng, d: int, n_head: int):
    k1, k2, k3 = jax.random.split(rng, 3)
    p = _mha_init(k1, d)
    p["linear_pos"] = {"w": linear_init(k2, d, d, bias=False)["w"]}
    dk = d // n_head
    bound = math.sqrt(6.0 / (n_head + dk))
    p["pos_bias_u"] = jax.random.uniform(k3, (n_head, dk), minval=-bound,
                                         maxval=bound)
    p["pos_bias_v"] = jax.random.uniform(jax.random.fold_in(k3, 1),
                                         (n_head, dk), minval=-bound,
                                         maxval=bound)
    return p


def _legacy_rel_shift(x):
    """ref ``transformer/attention.py:307-327`` (Transformer-XL appendix B)."""
    b, h, t1, t2 = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, t2 + 1, t1)[:, :, 1:]
    return x.reshape(b, h, t1, t2)


def legacy_relpos_mha_apply(p, x, pos_emb, n_head: int, mask=None):
    """LegacyRelPositionMultiHeadedAttention (ref attention.py:279-360)."""
    d = x.shape[-1]
    dk = d // n_head
    q = _heads(linear_apply(p["linear_q"], x), n_head)  # (B,H,T,dk)
    k = _heads(linear_apply(p["linear_k"], x), n_head)
    v = _heads(linear_apply(p["linear_v"], x), n_head)
    t_pos = pos_emb.shape[1]
    pk = linear_apply(p["linear_pos"], pos_emb).reshape(
        1, t_pos, n_head, dk).transpose(0, 2, 1, 3)
    q_u = q + p["pos_bias_u"][None, :, None, :]
    q_v = q + p["pos_bias_v"][None, :, None, :]
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,bhkd->bhqk", q_v, jnp.broadcast_to(
        pk, (q.shape[0],) + pk.shape[1:]), preferred_element_type=jnp.float32)
    scores = (ac + _legacy_rel_shift(bd)) / math.sqrt(dk)
    if mask is None:
        att = jax.nn.softmax(scores, axis=-1)
    else:
        att = masked_softmax(scores, mask)
    out = jnp.einsum("bhqk,bhkd->bhqd", att.astype(x.dtype), v)
    b, h, t, _ = out.shape
    return linear_apply(p["linear_out"], out.transpose(0, 2, 1, 3)
                        .reshape(b, t, h * dk))


# -- conformer conv module (ref mfcca_encoder.py:40-101) ---------------------


def _conv_module_init(rng, d: int, kernel: int):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {"pointwise_conv1": conv1d_init(k1, d, 2 * d, 1),
            "depthwise_conv": {
                "w": jax.random.uniform(k2, (kernel, d), minval=-1, maxval=1)
                / math.sqrt(kernel),
                "b": jnp.zeros((d,))},
            "norm": batchnorm_init(d),
            "pointwise_conv2": conv1d_init(k3, d, d, 1)}


def _conv_module_apply(p, x, kernel: int, act):
    from funasr_tpu.core.layers import conv1d_apply
    h = conv1d_apply(p["pointwise_conv1"], x)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # GLU
    w = p["depthwise_conv"]["w"]
    k, c = w.shape
    pad = (kernel - 1) // 2
    h = jax.lax.conv_general_dilated(
        h, w[:, None, :].astype(h.dtype), window_strides=(1,),
        padding=((pad, pad),), dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=c, preferred_element_type=jnp.float32) \
        .astype(h.dtype) + p["depthwise_conv"]["b"]
    h = act(batchnorm_apply(p["norm"], h))
    return conv1d_apply(p["pointwise_conv2"], h)


# -- encoder ------------------------------------------------------------------


@tables.register("encoder_classes", "MFCCAEncoder")
class MFCCAEncoder:
    """ref ``mfcca_encoder.py:104``. Production config: legacy rel-pos self
    attention, no macaron, conv module kernel 31, swish."""

    def __init__(self, input_size: int, output_size: int = 256,
                 attention_heads: int = 4, linear_units: int = 2048,
                 num_blocks: int = 6, input_layer: Optional[str] = "conv2d",
                 normalize_before: bool = True, macaron_style: bool = False,
                 rel_pos_type: str = "legacy",
                 pos_enc_layer_type: str = "rel_pos",
                 selfattention_layer_type: str = "rel_selfattn",
                 activation_type: str = "swish", use_cnn_module: bool = True,
                 cnn_module_kernel: int = 31, dropout_rate: float = 0.0, **_):
        if rel_pos_type == "legacy" and selfattention_layer_type == "rel_selfattn":
            selfattention_layer_type = "legacy_rel_selfattn"
        assert selfattention_layer_type in ("legacy_rel_selfattn", "selfattn"), \
            selfattention_layer_type
        assert normalize_before and not macaron_style, \
            "MFCCA production config: pre-norm, no macaron"
        self.input_size = input_size
        self._output_size = output_size
        self.attention_heads = attention_heads
        self.linear_units = linear_units
        self.num_blocks = num_blocks
        self.input_layer = input_layer
        self.rel_attn = selfattention_layer_type == "legacy_rel_selfattn"
        self.act = swish if activation_type == "swish" else jax.nn.relu
        self.use_cnn_module = use_cnn_module
        self.cnn_module_kernel = cnn_module_kernel

    def output_size(self) -> int:
        return self._output_size

    def init(self, rng):
        d = self._output_size
        keys = iter(jax.random.split(rng, self.num_blocks + 8))
        layers = []
        for _ in range(self.num_blocks):
            k1, k2, k3, k4 = jax.random.split(next(keys), 4)
            lp = {
                "norm_mha_cca": layer_norm_init(d),
                "cca": _mha_init(k1, d),
                "norm_mha": layer_norm_init(d),
                "self_attn": legacy_relpos_mha_init(k2, d, self.attention_heads)
                if self.rel_attn else _mha_init(k2, d),
                "norm_ff": layer_norm_init(d),
                "feed_forward": ffn_init(k3, d, self.linear_units),
            }
            if self.use_cnn_module:
                lp["norm_conv"] = layer_norm_init(d)
                lp["conv_module"] = _conv_module_init(k4, d,
                                                      self.cnn_module_kernel)
                lp["norm_final"] = layer_norm_init(d)
            layers.append(lp)
        p = {"encoders": layers, "after_norm": layer_norm_init(d)}
        if self.input_layer == "conv2d":
            p["embed"] = conv2d_subsampling_init(next(keys), self.input_size, d)
        elif self.input_layer == "linear":
            p["embed"] = {"linear": linear_init(next(keys), self.input_size, d),
                          "norm": layer_norm_init(d)}
        # channel-fusion stack (ref mfcca_encoder.py:339-345): 8->16->32->16->1
        for name, (ci, co) in {"conv1": (8, 16), "conv2": (16, 32),
                               "conv3": (32, 16), "conv4": (16, 1)}.items():
            p[name] = conv2d_init(next(keys), ci, co, 5, 7, bias=True)
        return p

    init_params = init

    def _cca(self, lp, x, b: int, channel_size: int):
        """Multi-frame cross-channel attention (ref encoder_layer_mfcca.py:240-266):
        queries are each frame's channel vectors; keys/values span a 5-frame
        window of every channel."""
        bc, t, d = x.shape
        residual = x
        h = layer_norm_apply(lp["norm_mha_cca"], x)
        xn = h.reshape(b, channel_size, t, d).transpose(0, 2, 1, 3)  # (B,T,C,D)
        xp = jnp.pad(xn, ((0, 0), (2, 2), (0, 0), (0, 0)))
        # 5-frame window: (B, T, 5, C, D) via static shifted slices
        win = jnp.stack([xp[:, i:i + t] for i in range(5)], axis=2)
        q = xn.reshape(b * t, channel_size, d)
        kv = win.reshape(b * t, 5 * channel_size, d)
        att = _mha_apply(lp["cca"], q, kv, self.attention_heads)
        att = att.reshape(b, t, channel_size, d).transpose(0, 2, 1, 3) \
            .reshape(bc, t, d)
        return residual + att

    def _conformer(self, lp, x, pos_emb, mask):
        residual = x
        h = layer_norm_apply(lp["norm_mha"], x)
        if self.rel_attn:
            att = legacy_relpos_mha_apply(lp["self_attn"], h, pos_emb,
                                          self.attention_heads, mask)
        else:
            att = _mha_apply(lp["self_attn"], h, h, self.attention_heads, mask)
        x = residual + att
        if self.use_cnn_module:
            residual = x
            h = layer_norm_apply(lp["norm_conv"], x)
            x = residual + _conv_module_apply(lp["conv_module"], h,
                                              self.cnn_module_kernel, self.act)
        residual = x
        h = layer_norm_apply(lp["norm_ff"], x)
        # PositionwiseFeedForward built with the encoder activation (swish),
        # ref mfcca_encoder.py:261-267
        ff = lp["feed_forward"]
        x = residual + linear_apply(ff["w_2"],
                                    self.act(linear_apply(ff["w_1"], h)))
        if self.use_cnn_module:
            x = layer_norm_apply(lp["norm_final"], x)
        return x

    def __call__(self, params, xs_pad, ilens, channel_size: int = 1,
                 rng=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """xs_pad: (B*C, T, F) per-channel features; returns fused (B, T', D)."""
        d = self._output_size
        if self.input_layer == "conv2d":
            x, olens = conv2d_subsampling_apply(params["embed"], xs_pad, ilens,
                                                add_pe=False)
            x = x * math.sqrt(d)
        elif self.input_layer == "linear":
            x = layer_norm_apply(params["embed"]["norm"],
                                 linear_apply(params["embed"]["linear"], xs_pad))
            x = x * math.sqrt(d)
            olens = ilens
        else:
            x = xs_pad * math.sqrt(d)
            olens = ilens
        t = x.shape[1]
        pos_emb = legacy_rel_pe(t, d, x.dtype)[None] if self.rel_attn else None
        mask = make_pad_mask(olens, t)[:, None, None, :]
        b = x.shape[0] // channel_size
        for lp in params["encoders"]:
            x = self._cca(lp, x, b, channel_size)
            x = self._conformer(lp, x, pos_emb, mask)

        # channel fusion (ref mfcca_encoder.py:389-404)
        xs = x.reshape(b, channel_size, t, d)
        if channel_size < 8:
            reps = -(-8 // channel_size)
            xs = jnp.tile(xs, (1, reps, 1, 1))[:, :8]
        h = xs.transpose(0, 2, 3, 1)  # NHWC: (B, T, D, C=8)
        for name in ("conv1", "conv2", "conv3", "conv4"):
            h = jax.lax.conv_general_dilated(
                h, params[name]["w"].astype(h.dtype), window_strides=(1, 1),
                padding=((2, 2), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(h.dtype) \
                + params[name]["b"]
        x = h[..., 0]
        x = layer_norm_apply(params["after_norm"], x)
        out_lens = olens.reshape(b, channel_size)[:, 0]
        return x, out_lens
