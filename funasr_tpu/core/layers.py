"""Functional neural-net primitives.

Design: every layer is a pair of pure functions —

* ``<layer>_init(rng, ...) -> params``   (a nested dict pytree of ``jnp`` arrays)
* ``<layer>_apply(params, x, ...) -> y`` (pure, jit/pjit/vmap friendly)

Parameters use JAX-natural layouts (Linear kernels are ``(d_in, d_out)``); the torch
checkpoint converter (``funasr_tpu/convert``) transposes once at load time. Compute dtype
is controlled by the caller: params stay fp32, matmuls run in the dtype of ``x`` with fp32
accumulation (``preferred_element_type``), layernorm/softmax always in fp32 — the standard
TPU bf16 recipe.

Behavioral reference: FunASR layer conventions (LayerNorm eps 1e-12,
``funasr/models/transformer/layer_norm.py:24``; FFN shapes
``funasr/models/transformer/positionwise_feed_forward.py:24-34``,
``funasr/models/sanm/positionwise_feed_forward.py:22-33``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

LN_EPS = 1e-12


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------


def uniform_init(rng, shape, scale):
    return jax.random.uniform(rng, shape, jnp.float32, -scale, scale)


def linear_init(rng, d_in: int, d_out: int, bias: bool = True):
    """Matches torch.nn.Linear default init (kaiming-uniform fan_in)."""
    k_w, k_b = jax.random.split(rng)
    bound = 1.0 / math.sqrt(d_in)
    p = {"w": uniform_init(k_w, (d_in, d_out), bound)}
    if bias:
        p["b"] = uniform_init(k_b, (d_out,), bound)
    return p


def linear_apply(p, x, *, dtype=None):
    if "w_q" in p or "w_q8" in p:  # int8 layouts (ops/quant.py)
        from funasr_tpu.ops.quant import qlinear
        return qlinear(p, x if dtype is None else x.astype(dtype))
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    else:
        w = w.astype(x.dtype)
    y = jnp.matmul(x, w, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def embedding_init(rng, vocab: int, dim: int, padding_idx: Optional[int] = None):
    w = jax.random.normal(rng, (vocab, dim), jnp.float32)
    if padding_idx is not None and 0 <= padding_idx < vocab:
        w = w.at[padding_idx].set(0.0)
    return {"w": w}


def embedding_apply(p, ids, *, dtype=jnp.float32):
    return jnp.take(p["w"], ids, axis=0).astype(dtype)


def layer_norm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm_apply(p, x, *, eps: float = LN_EPS):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# depthwise conv1d (the FSMN memory block)
# ---------------------------------------------------------------------------


def depthwise_conv1d_init(rng, channels: int, kernel_size: int, bias: bool = False):
    """torch Conv1d(groups=channels) default init; kernel stored (kernel, channels)."""
    bound = 1.0 / math.sqrt(kernel_size)
    p = {"w": uniform_init(rng, (kernel_size, channels), bound)}
    if bias:
        p["b"] = uniform_init(jax.random.fold_in(rng, 1), (channels,), bound)
    return p


def depthwise_conv1d_apply(p, x, *, left_pad: int, right_pad: int):
    """x: (B, T, C) -> (B, T, C), zero padded (left_pad, right_pad), 'valid' conv.

    Implemented as a sum of shifted scaled copies: for the small kernels used here
    (k<=21) this lowers to k fused VPU multiply-adds — faster on TPU than a grouped
    conv lowering, and trivially differentiable.
    """
    k, c = p["w"].shape
    assert x.shape[-1] == c, (x.shape, c)
    xf = x.astype(jnp.float32)
    pad = jnp.pad(xf, ((0, 0), (left_pad, right_pad), (0, 0)))
    t_out = x.shape[1] + left_pad + right_pad - k + 1
    out = jnp.zeros((x.shape[0], t_out, c), jnp.float32)
    w = p["w"].astype(jnp.float32)
    for i in range(k):
        out = out + pad[:, i : i + t_out, :] * w[i]
    if "b" in p:
        out = out + p["b"]
    return out.astype(x.dtype)


def conv1d_init(rng, c_in: int, c_out: int, kernel_size: int, bias: bool = True):
    """Full conv1d; kernel stored (kernel, c_in, c_out) (torch init bounds)."""
    bound = 1.0 / math.sqrt(c_in * kernel_size)
    p = {"w": uniform_init(rng, (kernel_size, c_in, c_out), bound)}
    if bias:
        p["b"] = uniform_init(jax.random.fold_in(rng, 1), (c_out,), bound)
    return p


def conv1d_apply(p, x, *, left_pad: int = 0, right_pad: int = 0, stride: int = 1):
    """x: (B, T, C_in) -> (B, T', C_out); zero padding, 'valid' conv (MXU matmuls)."""
    w = p["w"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=((left_pad, right_pad),),
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        out = out + p["b"]
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# feed-forward blocks
# ---------------------------------------------------------------------------


def ffn_init(rng, dim: int, hidden: int):
    """PositionwiseFeedForward: Linear -> ReLU -> Linear."""
    k1, k2 = jax.random.split(rng)
    return {"w_1": linear_init(k1, dim, hidden), "w_2": linear_init(k2, hidden, dim)}


def ffn_apply(p, x):
    h = jax.nn.relu(linear_apply(p["w_1"], x))
    return linear_apply(p["w_2"], h)


def ffn_dec_sanm_init(rng, dim: int, hidden: int, adim: Optional[int] = None):
    """Decoder-side FFN: Linear -> ReLU -> LayerNorm(hidden) -> Linear(no bias)."""
    k1, k2 = jax.random.split(rng)
    return {
        "w_1": linear_init(k1, dim, hidden),
        "norm": layer_norm_init(hidden),
        "w_2": linear_init(k2, hidden, dim if adim is None else adim, bias=False),
    }


def ffn_dec_sanm_apply(p, x):
    h = jax.nn.relu(linear_apply(p["w_1"], x))
    h = layer_norm_apply(p["norm"], h)
    return linear_apply(p["w_2"], h)


def conv_transpose1d_init(rng, c_in: int, c_out: int, kernel: int):
    """torch ConvTranspose1d weight (C_in, C_out, K) stored as (C_in, C_out, K)."""
    bound = 1.0 / math.sqrt(c_in * kernel)
    return {"w": uniform_init(rng, (c_in, c_out, kernel), bound),
            "b": uniform_init(jax.random.fold_in(rng, 1), (c_out,), bound)}


def conv_transpose1d_apply_stride_eq_kernel(p, x):
    """Upsample where kernel == stride: each input frame emits K output frames.
    x: (B, T, C_in) -> (B, T*K, C_out)."""
    w = p["w"].astype(x.dtype)  # (C_in, C_out, K)
    y = jnp.einsum("btc,cdk->btkd", x, w, preferred_element_type=jnp.float32)
    b, t, k, d = y.shape
    return (y.reshape(b, t * k, d) + p["b"]).astype(x.dtype)


def lstm_init(rng, in_dim: int, hidden: int):
    """torch LSTM layout: gates ordered (i, f, g, o); kernels stored transposed."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    bound = 1.0 / math.sqrt(hidden)
    return {
        "w_ih": uniform_init(k1, (in_dim, 4 * hidden), bound),
        "w_hh": uniform_init(k2, (hidden, 4 * hidden), bound),
        "b_ih": uniform_init(k3, (4 * hidden,), bound),
        "b_hh": uniform_init(k4, (4 * hidden,), bound),
    }


def lstm_apply(p, x, reverse: bool = False, init=None, return_state: bool = False):
    """x: (B, T, D) -> (B, T, H) single-layer LSTM via lax.scan.

    ``init``: optional (h, c) initial state, each (B, H) — torch LSTM's (h0, c0)
    role (used by the EEND encoder-decoder attractor). ``return_state`` also
    returns the final (h, c).
    """
    h_dim = p["w_hh"].shape[0]
    b = x.shape[0]
    xf = x.astype(jnp.float32)
    pre = jnp.einsum("btd,dg->btg", xf, p["w_ih"].astype(jnp.float32)) \
        + p["b_ih"] + p["b_hh"]

    def step(carry, pre_t):
        h, c = carry
        gates = pre_t + jnp.matmul(h, p["w_hh"].astype(jnp.float32))
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    if init is None:
        init = (jnp.zeros((b, h_dim), jnp.float32),
                jnp.zeros((b, h_dim), jnp.float32))
    else:
        init = (init[0].astype(jnp.float32), init[1].astype(jnp.float32))
    seq = pre.swapaxes(0, 1)
    state, hs = jax.lax.scan(step, init, seq, reverse=reverse)
    out = hs.swapaxes(0, 1).astype(x.dtype)
    if return_state:
        return out, state
    return out


def lstm_step(p, x_t, state):
    """One LSTM cell step: x_t (B, D), state (h, c) each (B, H) -> (h, (h, c)).

    Same gate order/bias handling as :func:`lstm_apply`; used for incremental
    decoding (transducer prediction network) where re-running the whole prefix
    per emission would be O(U)."""
    h, c = state
    pre = jnp.matmul(x_t.astype(jnp.float32), p["w_ih"].astype(jnp.float32)) \
        + p["b_ih"] + p["b_hh"] \
        + jnp.matmul(h, p["w_hh"].astype(jnp.float32))
    i, f, g, o = jnp.split(pre, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h.astype(x_t.dtype), (h, c)


def bilstm_apply(p_fw, p_bw, x):
    return jnp.concatenate([lstm_apply(p_fw, x), lstm_apply(p_bw, x, reverse=True)],
                           axis=-1)


# ---------------------------------------------------------------------------
# positional encoding & masks
# ---------------------------------------------------------------------------


def sinusoidal_pe(positions, depth: int, dtype=jnp.float32):
    """FunASR SinusoidalPositionEncoder.encode: timescale split sin||cos.

    ``positions``: (T,) 1-based float positions. Returns (T, depth).
    (behavior of funasr/models/transformer/embedding.py:396-420)
    """
    positions = positions.astype(jnp.float32)
    log_timescale_increment = math.log(10000.0) / (depth / 2 - 1)
    inv_timescales = jnp.exp(
        jnp.arange(depth // 2, dtype=jnp.float32) * -log_timescale_increment
    )
    scaled = positions[:, None] * inv_timescales[None, :]
    pe = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    return pe.astype(dtype)


def add_sinusoidal_pe(x, start_pos: int = 1):
    """x: (B, T, D) -> x + pe, positions start at ``start_pos`` (reference starts at 1)."""
    t, d = x.shape[1], x.shape[2]
    pos = jnp.arange(start_pos, start_pos + t, dtype=jnp.float32)
    return x + sinusoidal_pe(pos, d, x.dtype)[None]


def make_pad_mask(lengths, maxlen: int):
    """(B,) lengths -> (B, T) bool, True at VALID positions (note: inverse of torch ref)."""
    return jnp.arange(maxlen)[None, :] < lengths[:, None]


def masked_softmax(scores, mask, *, axis=-1):
    """Softmax in fp32 with a boolean valid-mask (True = attend).

    Uses a large-finite fill (not -inf) so fully-masked rows — e.g. the
    fsmn-shift rows of overlap-chunk training masks — produce finite values and
    finite gradients (then zeroed), matching the torch reference's
    masked_fill(min) -> softmax -> masked_fill(0) sequence.
    """
    sf = scores.astype(jnp.float32)
    if mask is not None:
        sf = jnp.where(mask, sf, jnp.finfo(jnp.float32).min)
    out = jax.nn.softmax(sf, axis=axis)
    if mask is not None:
        out = jnp.where(mask, out, 0.0)
    return out.astype(scores.dtype)
