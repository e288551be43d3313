"""Pallas flash attention for TPU — long-form self-attention without O(T^2) HBM.

Used by the SAN-M encoder when sequences exceed the quadratic-comfortable range
(no-VAD long-form decoding): block-wise online-softmax attention, (B*H) x Tq-blocks
grid, K/V streamed through VMEM. Padding is handled by a valid-length scalar per
batch row (keys beyond it are masked).

Numerics match the XLA einsum path (fp32 accumulation); tested in interpret mode on
CPU and on device against the reference implementation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int,
                  sm_scale: float):
    """Grid: (B*H, num_q_blocks). len_ref: scalar-prefetch (B*H,);
    q_ref: (1, block_q, d); k/v_ref: (1, Tk, d)."""
    q = q_ref[0].astype(jnp.float32) * sm_scale
    t_k = k_ref.shape[1]
    valid_len = len_ref[pl.program_id(0)]

    block_q, d = q.shape
    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, d), jnp.float32)

    num_kb = t_k // block_k

    def body(kb, carry):
        m_prev, l_prev, acc_prev = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        # mask keys beyond the row's valid length
        key_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                          (1, block_k), 1)
        s = jnp.where(key_idx < valid_len, s, NEG_INF)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc_prev * alpha + jnp.dot(p, v_blk,
                                             preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, lengths, block_q: int = 256, block_k: int = 256,
                    interpret: bool = False):
    """q, k, v: (B, H, T, D); lengths: (B,) valid key lengths -> (B, H, T, D).

    T must be a multiple of the block sizes (callers pad); D should be a multiple
    of 128 for MXU tiling.
    """
    b, h, t, d = q.shape
    assert t % block_q == 0 and t % block_k == 0, (t, block_q, block_k)
    sm_scale = 1.0 / math.sqrt(d)

    q_r = q.reshape(b * h, t, d)
    k_r = k.reshape(b * h, t, d)
    v_r = v.reshape(b * h, t, d)
    lens_r = jnp.repeat(lengths.astype(jnp.int32), h)  # (B*H,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, t // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, lens: (i, j, 0)),
            pl.BlockSpec((1, t, d), lambda i, j, lens: (i, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i, j, lens: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, lens: (i, j, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        interpret=interpret,
    )(lens_r, q_r, k_r, v_r)
    return out.reshape(b, h, t, d)
