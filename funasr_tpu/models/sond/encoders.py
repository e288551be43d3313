"""SOND encoder stack, TPU-native.

Functional-JAX rebuilds of the reference SOND sub-networks:

- ``ResNet34Diar`` / ``ResNet34SpL2RegDiar`` speech encoders
  (reference ``funasr/models/sond/encoder/resnet34_encoder.py:345,451``):
  pre-activation ResNet-34 over (time, freq) with TF-style "same" padding,
  run here as NHWC convs (H=time, W=freq) so XLA tiles them onto the MXU.
- ``ConvEncoder`` speaker encoder (``sond/encoder/conv_encoder.py:89``).
- ``FsmnEncoder`` post-net (``sond/encoder/fsmn_encoder.py:110``).
- ``SelfAttentionEncoder`` CD scorer (``sond/encoder/self_attention_encoder.py:120``)
  with the fused-QKV ``MultiHeadSelfAttention`` (``sond/attention.py:217``).
- ``DotScorer`` / ``CosScorer`` CI scorers (``sond/encoder/ci_scorers.py:5,27``).
- windowed / global statistic pooling (``sond/pooling/statistic_pooling.py:57,92``),
  vectorised with cumulative sums instead of the reference's per-window python
  loop — O(T) work, fully jittable, no dynamic shapes.

BatchNorm is inference-mode (folded running stats) like the other speaker
models in this package; training-mode BN would arrive with a training recipe.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    add_sinusoidal_pe, conv1d_apply, conv1d_init, ffn_init, layer_norm_apply,
    layer_norm_init, linear_apply, linear_init, make_pad_mask, masked_softmax)
from funasr_tpu.models.campplus.components import (
    batchnorm_apply, batchnorm_init, conv2d_init)
from funasr_tpu.register import tables

BN_EPS = 1e-3  # the SOND resnet/conv encoders use eps=1e-3 (ref resnet34_encoder.py:28)


# ---------------------------------------------------------------------------
# statistic pooling (ref sond/pooling/statistic_pooling.py)
# ---------------------------------------------------------------------------

_VAR_EPS = 1e-12


def statistic_pooling(x, lengths=None):
    """Global masked mean||std over time. x: (B, T, C) -> (B, 2C).

    Mirrors reference ``statistic_pooling`` (pooling over the time dim) with the
    VAR2STD epsilon clamp (``statistic_pooling.py:83-86``).
    """
    if lengths is None:
        mean = jnp.mean(x, axis=1)
        var = jnp.mean((x - mean[:, None]) ** 2, axis=1)
    else:
        m = make_pad_mask(lengths, x.shape[1])[..., None].astype(x.dtype)
        denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        mean = jnp.sum(x * m, axis=1) / denom
        var = jnp.sum(((x - mean[:, None]) ** 2) * m, axis=1) / denom
    var = jnp.where(var <= _VAR_EPS, _VAR_EPS, var)
    return jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)


def windowed_statistic_pooling(x, pool_size: int = 20, stride: int = 1):
    """Sliding-window mean||std over time via cumulative sums.

    x: (B, T, C) (or (B, T, F, C): pooled jointly over freq like the reference's
    ``pooling_dim=(2, 3)``). Returns (B, ceil(T/stride), 2C).

    The reference loops ``num_chunk`` times calling ``statistic_pooling`` per
    window (``statistic_pooling.py:120-124``); here one cumsum of x and x**2
    gives every window sum, which XLA lowers to a single fused scan — the
    TPU-friendly formulation of the same math (replicate edge padding included).
    """
    if x.ndim == 4:  # (B, T, F, C): fold freq into the window statistics
        count_extra = x.shape[2]
        xs = jnp.sum(x, axis=2)
        xs2 = jnp.sum(x * x, axis=2)
    else:
        count_extra = 1
        xs, xs2 = x, x * x
    t = xs.shape[1]
    pad = pool_size // 2
    xs = jnp.concatenate([jnp.repeat(xs[:, :1], pad, 1), xs,
                          jnp.repeat(xs[:, -1:], pad, 1)], axis=1)
    xs2 = jnp.concatenate([jnp.repeat(xs2[:, :1], pad, 1), xs2,
                           jnp.repeat(xs2[:, -1:], pad, 1)], axis=1)
    zero = jnp.zeros_like(xs[:, :1])
    cs = jnp.concatenate([zero, jnp.cumsum(xs.astype(jnp.float32), axis=1)], 1)
    cs2 = jnp.concatenate([zero, jnp.cumsum(xs2.astype(jnp.float32), axis=1)], 1)
    num_chunk = -(-t // stride)
    starts = jnp.arange(num_chunk) * stride
    # windows always fit: (num_chunk-1)*stride + pool <= t - 1 + 2*pad + 1
    wsum = cs[:, starts + pool_size] - cs[:, starts]
    wsum2 = cs2[:, starts + pool_size] - cs2[:, starts]
    count = float(pool_size * count_extra)
    mean = wsum / count
    var = jnp.maximum(wsum2 / count - mean * mean, _VAR_EPS)
    out = jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# ResNet-34 speech encoders (ref resnet34_encoder.py)
# ---------------------------------------------------------------------------


def _conv2d_valid(p, x, *, stride=(1, 1)):
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if "b" in p:
        out = out + p["b"]
    return out.astype(x.dtype)


def _proper_pad(x, stride: int):
    """TF-"same" padding before a VALID 3x3 conv (ref resnet34_encoder.py:40-52).

    x: (B, H, W, C). stride 1 -> pad 1 each side; stride 2 -> pad
    (top=h%2, bottom=1, left=w%2, right=1). Shapes are static under jit.
    """
    h, w = x.shape[1], x.shape[2]
    if stride == 1:
        cfg = ((0, 0), (1, 1), (1, 1), (0, 0))
    else:
        cfg = ((0, 0), (h % 2, 1), (w % 2, 1), (0, 0))
    return jnp.pad(x, cfg)


def _basic_layer_init(rng, c_in: int, c_out: int, stride: int):
    k1, k2, k3 = jax.random.split(rng, 3)
    p = {"bn1": batchnorm_init(c_in), "conv1": conv2d_init(k1, c_in, c_out, 3, 3),
         "bn2": batchnorm_init(c_out), "conv2": conv2d_init(k2, c_out, c_out, 3, 3)}
    if c_in != c_out or stride > 1:
        p["conv_sc"] = conv2d_init(k3, c_in, c_out, 1, 1)
        p["bn_sc"] = batchnorm_init(c_out)
    return p


def _basic_layer_apply(p, x, lens, stride: int):
    identity = x
    if "conv_sc" in p:
        identity = batchnorm_apply(p["bn_sc"], _conv2d_valid(
            p["conv_sc"], identity, stride=(stride, stride)), eps=BN_EPS)
    h = jax.nn.relu(batchnorm_apply(p["bn1"], x, eps=BN_EPS))
    h = _conv2d_valid(p["conv1"], _proper_pad(h, stride), stride=(stride, stride))
    h = jax.nn.relu(batchnorm_apply(p["bn2"], h, eps=BN_EPS))
    h = _conv2d_valid(p["conv2"], _proper_pad(h, 1))
    if stride == 2:
        lens = (lens + 1) // 2
    return h + identity, lens


class _ResNet34Base:
    """Shared trunk (ref ``ResNet34``/``ResNet34_SP_L2Reg``)."""

    def __init__(self, input_size: int, use_head_conv: bool = True,
                 use_head_maxpool: bool = False,
                 num_nodes_pooling_layer: int = 256,
                 layers_in_block: Sequence[int] = (3, 4, 6, 3),
                 filters_in_block: Sequence[int] = (32, 64, 128, 256),
                 sp_l2reg: bool = True, **_):
        self.input_size = input_size
        self.use_head_conv = use_head_conv
        self.use_head_maxpool = use_head_maxpool
        self.num_nodes_pooling_layer = num_nodes_pooling_layer
        self.layers_in_block = tuple(layers_in_block)
        self.filters_in_block = tuple(filters_in_block)
        self.sp_l2reg = sp_l2reg
        self.time_ds_ratio = 8

    def _trunk_init(self, rng):
        keys = iter(jax.random.split(rng, 4 + sum(self.layers_in_block)))
        p = {}
        pre = self.filters_in_block[0]
        if self.use_head_conv:
            p["pre_conv"] = conv2d_init(next(keys), 1, pre, 3, 3)
            p["pre_conv_bn"] = batchnorm_init(pre)
        for bi, (n_layer, filt) in enumerate(zip(self.layers_in_block,
                                                 self.filters_in_block)):
            c_in = (pre if self.use_head_conv else 1) if bi == 0 \
                else self.filters_in_block[bi - 1]
            layers = []
            for li in range(n_layer):
                layers.append(_basic_layer_init(
                    next(keys), c_in if li == 0 else filt, filt,
                    (1 if bi == 0 else 2) if li == 0 else 1))
            p[f"block_{bi}"] = layers
        c_last = self.filters_in_block[-1]
        dense_in = c_last * (self.input_size // 8) if self.sp_l2reg else c_last
        p["resnet0_dense"] = conv1d_init(next(keys), dense_in,
                                         self.num_nodes_pooling_layer, 1) \
            if self.sp_l2reg else conv2d_init(
                next(keys), c_last, self.num_nodes_pooling_layer, 1, 1, bias=True)
        p["resnet0_bn"] = batchnorm_init(self.num_nodes_pooling_layer)
        return p

    def _trunk_apply(self, p, feats, lens):
        """feats: (B, T, F) -> SP-variant (B, T', 256) or base (B, T', F', 256)."""
        h = feats[..., None]  # NHWC, H=T, W=F
        if self.use_head_conv:
            h = _conv2d_valid(p["pre_conv"], jnp.pad(
                h, ((0, 0), (1, 1), (1, 1), (0, 0))))
            h = jax.nn.relu(batchnorm_apply(p["pre_conv_bn"], h, eps=BN_EPS))
        if self.use_head_maxpool:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
                ((0, 0), (1, 1), (1, 1), (0, 0)))
        for bi, n_layer in enumerate(self.layers_in_block):
            for li in range(n_layer):
                h, lens = _basic_layer_apply(
                    p[f"block_{bi}"][li], h, lens,
                    (1 if bi == 0 else 2) if li == 0 else 1)
        if self.sp_l2reg:
            b, t, f, c = h.shape
            # torch (B,C,T,F)->permute(0,3,1,2)->(B,F*C,T): channel index f*C+c,
            # which equals reshaping our NHWC (B,T,F,C) trailing dims.
            h = h.reshape(b, t, f * c)
            h = jax.nn.relu(conv1d_apply(p["resnet0_dense"], h))
            h = batchnorm_apply(p["resnet0_bn"], h, eps=BN_EPS)
        else:
            h = jax.nn.relu(_conv2d_valid(p["resnet0_dense"], h))
            h = batchnorm_apply(p["resnet0_bn"], h, eps=BN_EPS)
        return h, lens


@tables.register("encoder_classes", "ResNet34Diar")
@tables.register("encoder_classes", "ResNet34SpL2RegDiar")
class ResNet34SpL2RegDiar(_ResNet34Base):
    """Frame-level diarization embedding encoder (ref resnet34_encoder.py:451).

    Trunk -> windowed statistic pooling -> resnet1/resnet2 dense heads; returns
    the ``embedding_node`` endpoint (default ``resnet1_dense``, pre-activation).
    """

    def __init__(self, input_size: int, embedding_node: str = "resnet1_dense",
                 num_nodes_resnet1: int = 256, num_nodes_last_layer: int = 256,
                 pooling_type: str = "window_shift", pool_size: int = 20,
                 stride: int = 1, sp_l2reg: bool = True, **kwargs):
        super().__init__(input_size, sp_l2reg=sp_l2reg, **kwargs)
        self.embedding_node = embedding_node
        self.num_nodes_resnet1 = num_nodes_resnet1
        self.num_nodes_last_layer = num_nodes_last_layer
        self.pooling_type = pooling_type
        self.pool_size = pool_size
        self.stride = stride

    def output_size(self) -> int:
        if self.embedding_node.startswith("resnet1"):
            return self.num_nodes_resnet1
        if self.embedding_node.startswith("resnet2"):
            return self.num_nodes_last_layer
        return self.num_nodes_pooling_layer

    def init(self, rng):
        k0, k1, k2 = jax.random.split(rng, 3)
        p = self._trunk_init(k0)
        p["resnet1_dense"] = linear_init(k1, self.num_nodes_pooling_layer * 2,
                                         self.num_nodes_resnet1)
        p["resnet1_bn"] = batchnorm_init(self.num_nodes_resnet1)
        p["resnet2_dense"] = linear_init(k2, self.num_nodes_resnet1,
                                         self.num_nodes_last_layer)
        p["resnet2_bn"] = batchnorm_init(self.num_nodes_last_layer)
        return p

    init_params = init

    def __call__(self, p, feats, lens):
        h, lens = self._trunk_apply(p, feats, lens)
        endpoints = {"resnet0_bn": h}
        if self.pooling_type == "frame_gsp":
            h = statistic_pooling(h if h.ndim == 3 else
                                  h.reshape(h.shape[0], h.shape[1], -1))[:, None]
        else:
            h = windowed_statistic_pooling(h, self.pool_size, self.stride)
            lens = -(-lens // self.stride)
        endpoints["pooling"] = h
        h = linear_apply(p["resnet1_dense"], h)
        endpoints["resnet1_dense"] = h
        h = jax.nn.relu(h)
        endpoints["resnet1_relu"] = h
        h = batchnorm_apply(p["resnet1_bn"], h, eps=BN_EPS)
        endpoints["resnet1_bn"] = h
        h = linear_apply(p["resnet2_dense"], h)
        endpoints["resnet2_dense"] = h
        h = jax.nn.relu(h)
        endpoints["resnet2_relu"] = h
        h = batchnorm_apply(p["resnet2_bn"], h, eps=BN_EPS)
        endpoints["resnet2_bn"] = h
        return endpoints[self.embedding_node], lens


# ---------------------------------------------------------------------------
# ConvEncoder speaker encoder (ref conv_encoder.py:89)
# ---------------------------------------------------------------------------


@tables.register("encoder_classes", "ConvEncoder")
class ConvEncoder:
    """Stack of same-padded Conv1d layers with residuals from layer 1 on."""

    def __init__(self, num_layers: int, input_units: int, num_units: int,
                 kernel_size: int = 3, activation: str = "tanh",
                 auxiliary_states: bool = True, out_units: Optional[int] = None,
                 out_norm: bool = False, out_residual: bool = False,
                 include_batchnorm: bool = False, stride=1,
                 position_encoder=None, dropout_rate: float = 0.0, **_):
        self.num_layers = num_layers
        self.input_units = input_units
        self.num_units = num_units
        self.kernel_size = kernel_size
        self.act = jnp.tanh if activation == "tanh" else jax.nn.relu
        self.out_units = out_units
        self.out_norm = out_norm
        self.out_residual = out_residual
        self.include_batchnorm = include_batchnorm
        self.position_encoder = position_encoder
        self.stride = [stride] * num_layers if isinstance(stride, int) else stride

    def output_size(self) -> int:
        return self.num_units

    def init(self, rng):
        keys = jax.random.split(rng, self.num_layers + 1)
        layers = []
        for i in range(self.num_layers):
            lp = {"conv": conv1d_init(keys[i],
                                      self.input_units if i == 0 else self.num_units,
                                      self.num_units, self.kernel_size)}
            if self.include_batchnorm:
                lp["bn"] = batchnorm_init(self.num_units)
            layers.append(lp)
        p = {"layers": layers}
        if self.out_units is not None:
            p["conv_out"] = conv1d_init(keys[-1], self.num_units, self.out_units,
                                        self.kernel_size)
        if self.out_norm:
            p["after_norm"] = layer_norm_init(self.out_units)
        return p

    init_params = init

    def _same_pads(self, stride: int):
        left = math.ceil((self.kernel_size - stride) / 2)
        return left, self.kernel_size - stride - left

    def __call__(self, p, x, lens):
        inputs = x
        if self.position_encoder is not None:
            x = add_sinusoidal_pe(x)
        h = x
        for i, lp in enumerate(p["layers"]):
            s = self.stride[i]
            left, right = self._same_pads(s)
            out = conv1d_apply(lp["conv"], h, left_pad=left, right_pad=right,
                               stride=s)
            if i > 0 and s == 1:
                out = out + h
            if "bn" in lp:
                out = batchnorm_apply(lp["bn"], out, eps=BN_EPS)
            h = self.act(out)
        if self.out_units is not None:
            left, right = self._same_pads(self.stride[0])
            h = conv1d_apply(p["conv_out"], h, left_pad=left, right_pad=right)
        if self.out_norm:
            h = layer_norm_apply(p["after_norm"], h)
        if self.out_residual:
            h = h + inputs
        return h, lens


# ---------------------------------------------------------------------------
# FsmnEncoder post-net (ref fsmn_encoder.py:110)
# ---------------------------------------------------------------------------


def _fsmn_ffn_init(rng, c_in: int, hidden: int, c_out: int):
    k1, k2 = jax.random.split(rng)
    return {"w_1": conv1d_init(k1, c_in, hidden, 1),
            "w_2": conv1d_init(k2, hidden, c_out, 1, bias=False),
            "norm": layer_norm_init(hidden)}


def _fsmn_ffn_apply(p, x):
    """conv1x1 -> relu -> LayerNorm -> conv1x1 (ref multi_layer_conv.py:66-114)."""
    h = jax.nn.relu(conv1d_apply(p["w_1"], x))
    h = layer_norm_apply(p["norm"], h)
    return conv1d_apply(p["w_2"], h)


def _dw_conv_padded(p, x, left: int, right: int):
    """Depthwise conv over time with explicit zero padding; p["w"]: (K, C)."""
    w = p["w"]  # (K, C)
    k, c = w.shape
    out = jax.lax.conv_general_dilated(
        x, w[:, None, :].astype(x.dtype), window_strides=(1,),
        padding=((left, right),), dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=c, preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


@tables.register("encoder_classes", "FsmnEncoder")
class FsmnEncoder:
    """FSMN stack: per-layer FFN + depthwise memory block, then DNN layers."""

    def __init__(self, in_units: int, filter_size: int, fsmn_num_layers: int,
                 dnn_num_layers: int, num_memory_units: int = 512,
                 ffn_inner_dim: int = 2048, dropout_rate: float = 0.0,
                 shift=0, position_encoder=None, sample_rate=1,
                 out_units: Optional[int] = None, **_):
        self.in_units = in_units
        self.filter_size = filter_size
        self.fsmn_num_layers = fsmn_num_layers
        self.dnn_num_layers = dnn_num_layers
        self.num_memory_units = num_memory_units
        self.ffn_inner_dim = ffn_inner_dim
        self.shift = [shift] * fsmn_num_layers if not isinstance(shift, list) \
            else shift
        self.position_encoder = position_encoder
        self.out_units = out_units

    def output_size(self) -> int:
        return self.out_units or self.num_memory_units

    def init(self, rng):
        keys = jax.random.split(rng, self.fsmn_num_layers + self.dnn_num_layers + 1)
        fsmn_layers = []
        for i in range(self.fsmn_num_layers):
            k1, k2 = jax.random.split(keys[i])
            c_in = self.in_units if i == 0 else self.num_memory_units
            fsmn_layers.append({
                "ffn": _fsmn_ffn_init(k1, c_in, self.ffn_inner_dim,
                                      self.num_memory_units),
                "memory": {"w": jax.random.uniform(
                    k2, (self.filter_size, self.num_memory_units),
                    minval=-1, maxval=1) / math.sqrt(self.filter_size)},
            })
        dnn_layers = [
            _fsmn_ffn_init(keys[self.fsmn_num_layers + i], self.num_memory_units,
                           self.ffn_inner_dim, self.num_memory_units)
            for i in range(self.dnn_num_layers)]
        p = {"fsmn_layers": fsmn_layers, "dnn_layers": dnn_layers}
        if self.out_units is not None:
            p["conv1d"] = conv1d_init(keys[-1], self.num_memory_units,
                                      self.out_units, 1)
        return p

    init_params = init

    def __call__(self, p, x, lens):
        if self.position_encoder is not None:
            x = add_sinusoidal_pe(x)
        mask = make_pad_mask(lens, x.shape[1])[..., None].astype(x.dtype)
        h = x
        for i, lp in enumerate(p["fsmn_layers"]):
            context = _fsmn_ffn_apply(lp["ffn"], h)
            # FsmnBlock (ref fsmn_encoder.py:47-68): mask, pad, dwconv, residual
            m = context * mask
            left = (self.filter_size - 1) // 2 + max(self.shift[i], 0)
            right = self.filter_size - 1 - left
            mem = _dw_conv_padded(lp["memory"], m, left, right) + m
            mem = mem * mask
            h = mem + h if h.shape[-1] == mem.shape[-1] else mem
        for lp in p["dnn_layers"]:
            h = _fsmn_ffn_apply(lp, h)
        if self.out_units is not None:
            h = conv1d_apply(p["conv1d"], h)
        return h, lens


# ---------------------------------------------------------------------------
# SelfAttentionEncoder CD scorer (ref self_attention_encoder.py:120)
# ---------------------------------------------------------------------------


def _mhsa_init(rng, in_feat: int, n_feat: int):
    k1, k2 = jax.random.split(rng)
    return {"linear_q_k_v": linear_init(k1, in_feat, n_feat * 3),
            "linear_out": linear_init(k2, n_feat, n_feat)}


def _mhsa_apply(p, x, mask, n_head: int, n_feat: int):
    """Fused-QKV self attention (ref sond/attention.py:217-320)."""
    b, t, _ = x.shape
    d_k = n_feat // n_head
    qkv = linear_apply(p["linear_q_k_v"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(z):
        return z.reshape(b, t, n_head, d_k).transpose(0, 2, 1, 3)

    q = heads(q) * (d_k ** -0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, heads(k),
                        preferred_element_type=jnp.float32)
    att = masked_softmax(scores, mask[:, None, None, :])
    out = jnp.einsum("bhqk,bhkd->bhqd", att.astype(x.dtype), heads(v))
    out = out.transpose(0, 2, 1, 3).reshape(b, t, n_feat)
    return linear_apply(p["linear_out"], out)


@tables.register("encoder_classes", "SelfAttentionEncoder")
class SelfAttentionEncoder:
    """Pre-norm transformer encoder with fused-QKV attention and an optional
    output projection (``out_units``), used as SOND's CD scorer."""

    def __init__(self, input_size: int, output_size: int = 256,
                 attention_heads: int = 4, linear_units: int = 2048,
                 num_blocks: int = 6, input_layer: Optional[str] = "conv2d",
                 normalize_before: bool = True, out_units: Optional[int] = None,
                 dropout_rate: float = 0.0, **_):
        self.input_size = input_size
        self._output_size = output_size
        self.attention_heads = attention_heads
        self.linear_units = linear_units
        self.num_blocks = num_blocks
        self.input_layer = input_layer
        self.normalize_before = normalize_before
        self.out_units = out_units
        if input_layer not in (None, "null", "pe", "linear"):
            raise ValueError(f"SelfAttentionEncoder input_layer={input_layer} "
                             "not supported (use null/pe/linear)")

    def output_size(self) -> int:
        return self._output_size

    def init(self, rng):
        keys = jax.random.split(rng, self.num_blocks + 2)
        d = self._output_size
        p = {"encoders": []}
        for i in range(self.num_blocks):
            in_feat = self.input_size if (
                i == 0 and self.input_layer in ("pe", "null", None)
                and self.input_size != d) else d
            att_in = self.input_size if (i == 0 and
                                         self.input_layer in ("pe", "null")) else d
            k1, k2 = jax.random.split(keys[i])
            p["encoders"].append({
                "norm1": layer_norm_init(att_in if i == 0 and
                                         self.input_layer in ("pe", "null")
                                         else d),
                "norm2": layer_norm_init(d),
                "self_attn": _mhsa_init(k1, att_in, d),
                "feed_forward": ffn_init(k2, d, self.linear_units),
            })
        if self.input_layer == "linear":
            p["embed"] = {"linear": linear_init(keys[-2], self.input_size, d),
                          "norm": layer_norm_init(d)}
        elif self.input_layer is None and self.input_size != d:
            p["embed"] = {"linear": linear_init(keys[-2], self.input_size, d)}
        if self.normalize_before:
            p["after_norm"] = layer_norm_init(d)
        if self.out_units is not None:
            p["output_linear"] = linear_init(keys[-1], d, self.out_units)
        return p

    init_params = init

    def __call__(self, p, x, lens):
        mask = make_pad_mask(lens, x.shape[1])
        x = x * (self._output_size ** 0.5)
        if self.input_layer == "linear":
            x = jax.nn.relu(layer_norm_apply(
                p["embed"]["norm"], linear_apply(p["embed"]["linear"], x)))
            x = add_sinusoidal_pe(x)
        elif self.input_layer == "pe":
            x = add_sinusoidal_pe(x)
        elif self.input_layer is None and "embed" in p:
            x = linear_apply(p["embed"]["linear"], x)
        for i, lp in enumerate(p["encoders"]):
            first_narrow = (i == 0 and self.input_layer in ("pe", "null")
                            and self.input_size != self._output_size)
            h = layer_norm_apply(lp["norm1"], x) if self.normalize_before else x
            att = _mhsa_apply(lp["self_attn"], h, mask, self.attention_heads,
                              self._output_size)
            x = att if first_narrow else x + att
            if not self.normalize_before:
                x = layer_norm_apply(lp["norm1"], x)
            h = layer_norm_apply(lp["norm2"], x) if self.normalize_before else x
            from funasr_tpu.core.layers import ffn_apply
            x = x + ffn_apply(lp["feed_forward"], h)
            if not self.normalize_before:
                x = layer_norm_apply(lp["norm2"], x)
        if self.normalize_before:
            x = layer_norm_apply(p["after_norm"], x)
        if self.out_units is not None:
            x = linear_apply(p["output_linear"], x)
        return x, lens


# ---------------------------------------------------------------------------
# CI scorers (ref ci_scorers.py)
# ---------------------------------------------------------------------------


@tables.register("encoder_classes", "DotScorer")
class DotScorer:
    def __init__(self, **_):
        pass

    def init(self, rng):
        return {}

    init_params = init

    def __call__(self, p, xs, spk_emb):
        return jnp.einsum("btd,bsd->bts", xs, spk_emb,
                          preferred_element_type=jnp.float32).astype(xs.dtype)


@tables.register("encoder_classes", "CosScorer")
class CosScorer:
    def __init__(self, eps: float = 1e-8, **_):
        self.eps = eps

    def init(self, rng):
        return {}

    init_params = init

    def __call__(self, p, xs, spk_emb):
        # torch cosine_similarity clamps each norm at eps before dividing
        xn = jnp.maximum(jnp.linalg.norm(xs, axis=-1, keepdims=True), self.eps)
        sn = jnp.maximum(jnp.linalg.norm(spk_emb, axis=-1, keepdims=True),
                         self.eps)
        return jnp.einsum("btd,bsd->bts", xs / xn, spk_emb / sn,
                          preferred_element_type=jnp.float32).astype(xs.dtype)
