"""CAM++ building blocks in JAX (TPU-native rebuild of FunASR
``funasr/models/campplus/components.py``: FCM resnet front ``:53-100``, TDNN layer,
context-aware-masking CAM layer ``:195-250``, dense TDNN blocks, stats pooling).

Layouts: 2D convs run NHWC ((B, F, T, C)); 1D convs run (B, T, C); batch-norm is
inference-mode (folded running stats) — training-mode BN arrives with the speaker
training recipes.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import conv1d_apply, conv1d_init, uniform_init


def conv2d_init(rng, c_in: int, c_out: int, kh: int, kw: int, bias: bool = False):
    bound = 1.0 / math.sqrt(c_in * kh * kw)
    p = {"w": uniform_init(rng, (kh, kw, c_in, c_out), bound)}
    if bias:
        p["b"] = uniform_init(jax.random.fold_in(rng, 1), (c_out,), bound)
    return p


def conv2d_apply(p, x, *, stride=(1, 1), padding=(1, 1)):
    """x: (B, H, W, C_in) -> (B, H', W', C_out)."""
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=stride,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        out = out + p["b"]
    return out.astype(x.dtype)


def batchnorm_init(channels: int, affine: bool = True):
    p = {"mean": jnp.zeros((channels,), jnp.float32),
         "var": jnp.ones((channels,), jnp.float32)}
    if affine:
        p["scale"] = jnp.ones((channels,), jnp.float32)
        p["bias"] = jnp.zeros((channels,), jnp.float32)
    return p


def batchnorm_apply(p, x, eps: float = 1e-5):
    """Inference-mode BN over the trailing channel dim."""
    y = (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps)
    if "scale" in p:
        y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def bn_relu(p, x):
    return jax.nn.relu(batchnorm_apply(p, x))


# ---------------------------------------------------------------------------
# FCM: 2D resnet front
# ---------------------------------------------------------------------------


def basic_res_block_init(rng, c_in: int, c_out: int, stride: int = 1):
    k1, k2, k3 = jax.random.split(rng, 3)
    p = {
        "conv1": conv2d_init(k1, c_in, c_out, 3, 3),
        "bn1": batchnorm_init(c_out),
        "conv2": conv2d_init(k2, c_out, c_out, 3, 3),
        "bn2": batchnorm_init(c_out),
    }
    if stride != 1 or c_in != c_out:
        p["shortcut"] = {"conv": conv2d_init(k3, c_in, c_out, 1, 1),
                         "bn": batchnorm_init(c_out)}
    return p


def basic_res_block_apply(p, x, stride: int = 1):
    out = jax.nn.relu(batchnorm_apply(p["bn1"], conv2d_apply(
        p["conv1"], x, stride=(stride, 1), padding=(1, 1))))
    out = batchnorm_apply(p["bn2"], conv2d_apply(p["conv2"], out))
    if "shortcut" in p:
        sc = batchnorm_apply(p["shortcut"]["bn"], conv2d_apply(
            p["shortcut"]["conv"], x, stride=(stride, 1), padding=(0, 0)))
    else:
        sc = x
    return jax.nn.relu(out + sc)


def fcm_init(rng, m_channels: int = 32, feat_dim: int = 80, num_blocks=(2, 2)):
    keys = jax.random.split(rng, 3 + sum(num_blocks))
    p = {"conv1": conv2d_init(keys[0], 1, m_channels, 3, 3),
         "bn1": batchnorm_init(m_channels)}
    ki = 1
    for li, nb in enumerate(num_blocks):
        layers = []
        for bi in range(nb):
            layers.append(basic_res_block_init(keys[ki], m_channels, m_channels,
                                               stride=2 if bi == 0 else 1))
            ki += 1
        p[f"layer{li + 1}"] = layers
    p["conv2"] = conv2d_init(keys[ki], m_channels, m_channels, 3, 3)
    p["bn2"] = batchnorm_init(m_channels)
    return p


def fcm_apply(p, x):
    """x: (B, T, F) fbank -> (B, T, C*(F//8)) channel-stacked features."""
    h = x.transpose(0, 2, 1)[..., None]  # (B, F, T, 1)
    h = jax.nn.relu(batchnorm_apply(p["bn1"], conv2d_apply(p["conv1"], h)))
    for li in (1, 2):
        for bi, bp in enumerate(p[f"layer{li}"]):
            h = basic_res_block_apply(bp, h, stride=2 if bi == 0 else 1)
    h = jax.nn.relu(batchnorm_apply(p["bn2"], conv2d_apply(
        p["conv2"], h, stride=(2, 1), padding=(1, 1))))
    b, f, t, c = h.shape
    # torch reshape is (B, C*F, T) with C-major ordering: (B,C,F,T)->(B, C*F, T)
    h = h.transpose(0, 3, 1, 2).reshape(b, c * f, t)
    return h.transpose(0, 2, 1)  # (B, T, C*F)


# ---------------------------------------------------------------------------
# TDNN / CAM layers ((B, T, C) layout)
# ---------------------------------------------------------------------------


def tdnn_layer_init(rng, c_in: int, c_out: int, kernel: int, bias: bool = False):
    return {"linear": conv1d_init(rng, c_in, c_out, kernel, bias=bias),
            "bn": batchnorm_init(c_out)}


def tdnn_layer_apply(p, x, *, kernel: int, stride: int = 1, dilation: int = 1):
    pad = (kernel - 1) // 2 * dilation
    w = p["linear"]["w"]
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,), padding=((pad, pad),),
        rhs_dilation=(dilation,), dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p["linear"]:
        out = out + p["linear"]["b"]
    return bn_relu(p["bn"], out)


def cam_layer_init(rng, bn_channels: int, c_out: int, kernel: int, reduction: int = 2):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "linear_local": conv1d_init(k1, bn_channels, c_out, kernel, bias=False),
        "linear1": conv1d_init(k2, bn_channels, bn_channels // reduction, 1),
        "linear2": conv1d_init(k3, bn_channels // reduction, c_out, 1),
    }


def _seg_pooling(x, seg_len: int = 100):
    """avg-pool over time in ceil-mode windows, broadcast back (B, T, C)."""
    b, t, c = x.shape
    n_seg = -(-t // seg_len)
    pad_t = n_seg * seg_len
    mask = jnp.arange(pad_t) < t
    xp = jnp.pad(x, ((0, 0), (0, pad_t - t), (0, 0)))
    xs = xp.reshape(b, n_seg, seg_len, c)
    cnt = mask.reshape(n_seg, seg_len).sum(axis=1)[None, :, None]
    seg = xs.sum(axis=2) / jnp.maximum(cnt, 1)
    seg = jnp.repeat(seg, seg_len, axis=1)[:, :t]
    return seg


def cam_layer_apply(p, x, *, kernel: int, dilation: int = 1):
    pad = (kernel - 1) // 2 * dilation
    w = p["linear_local"]["w"]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,), padding=((pad, pad),),
        rhs_dilation=(dilation,), dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    context = jnp.mean(x, axis=1, keepdims=True) + _seg_pooling(x)
    context = jax.nn.relu(conv1d_apply(p["linear1"], context))
    m = jax.nn.sigmoid(conv1d_apply(p["linear2"], context))
    return y * m


def cam_dense_tdnn_layer_init(rng, c_in: int, c_out: int, bn_channels: int,
                              kernel: int):
    k1, k2 = jax.random.split(rng)
    return {
        "nonlinear1": batchnorm_init(c_in),
        "linear1": conv1d_init(k1, c_in, bn_channels, 1, bias=False),
        "nonlinear2": batchnorm_init(bn_channels),
        "cam_layer": cam_layer_init(k2, bn_channels, c_out, kernel),
    }


def cam_dense_tdnn_layer_apply(p, x, *, kernel: int, dilation: int):
    h = conv1d_apply(p["linear1"], bn_relu(p["nonlinear1"], x))
    return cam_layer_apply(p["cam_layer"], bn_relu(p["nonlinear2"], h),
                           kernel=kernel, dilation=dilation)


def stats_pool(x, eps_unbiased: bool = True):
    """(B, T, C) -> (B, 2C): mean || unbiased std over time."""
    mean = jnp.mean(x, axis=1)
    n = x.shape[1]
    var = jnp.sum(jnp.square(x - mean[:, None, :]), axis=1) / max(n - 1, 1)
    return jnp.concatenate([mean, jnp.sqrt(jnp.maximum(var, 0.0))], axis=-1)
