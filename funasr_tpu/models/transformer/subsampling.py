"""Conv2d subsampling front (espnet style, FunASR ``funasr/models/transformer/utils/
subsampling.py`` behavior): two stride-2 3x3 convs + linear + PE -> T/4."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import linear_apply, linear_init
from funasr_tpu.models.campplus.components import conv2d_init
from funasr_tpu.models.transformer.attention import add_espnet_pe


def conv2d_subsampling_init(rng, idim: int, odim: int):
    k1, k2, k3 = jax.random.split(rng, 3)
    f_out = (((idim - 1) // 2 - 1) // 2)
    return {
        "conv1": conv2d_init(k1, 1, odim, 3, 3, bias=True),
        "conv2": conv2d_init(k2, odim, odim, 3, 3, bias=True),
        "out": linear_init(k3, odim * f_out, odim),
    }


def conv2d_subsampling_apply(params, x, lengths, add_pe: bool = True):
    """x: (B, T, F) -> ((B, T//4ish, odim), lengths//4ish)."""
    h = x[:, :, :, None]  # NHWC with H=T, W=F
    h = jax.lax.conv_general_dilated(
        h, params["conv1"]["w"].astype(h.dtype), window_strides=(2, 2),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    h = jax.nn.relu(h + params["conv1"]["b"])
    h = jax.lax.conv_general_dilated(
        h, params["conv2"]["w"].astype(h.dtype), window_strides=(2, 2),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    h = jax.nn.relu(h + params["conv2"]["b"])
    b, t, f, c = h.shape
    h = h.transpose(0, 1, 3, 2).reshape(b, t, c * f)
    h = linear_apply(params["out"], h)
    # espnet computes output lengths by slicing the mask ``[:, :, :-2:2]``
    # twice: kept frame k maps to input index 4k, so the valid count is
    # #{k < T' : 4k < len} — NOT the arithmetic conv formula.
    out_lens = jnp.minimum((lengths + 3) // 4, t).astype(jnp.int32)
    if add_pe:
        h = add_espnet_pe(h)
    return h, out_lens
