"""CIF predictor (CifPredictorV2): conv -> sigmoid alphas -> integrate-and-fire.

TPU-native rebuild of the reference predictor (FunASR ``funasr/models/paraformer/
cif_predictor.py``: ``CifPredictorV2:209-412`` — pad(l,r) conv1d + relu + linear +
sigmoid alphas, alpha rescale to target length in training, ``tail_process_fn:414-442``
tail-threshold handling; vectorized fire math from ``cif_v1:853-908``).

Static-shape policy: the fired-token axis is a caller-chosen bucket ``max_tokens``;
``token_num`` stays a traced float; downstream decoding masks padded token slots.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import conv1d_apply, conv1d_init, linear_apply, linear_init
from funasr_tpu.ops.cif import cif, cif_scan_step
from funasr_tpu.register import tables


class CifConfig(NamedTuple):
    idim: int
    l_order: int = 1
    r_order: int = 1
    threshold: float = 1.0
    smooth_factor: float = 1.0
    noise_threshold: float = 0.0
    tail_threshold: float = 0.45
    tail_mask: bool = True


@tables.register("predictor_classes", "CifPredictorV2")
class CifPredictorV2:
    def __init__(self, idim: int, l_order: int = 1, r_order: int = 1,
                 threshold: float = 1.0, smooth_factor: float = 1.0,
                 noise_threshold: float = 0.0, tail_threshold: float = 0.45,
                 tail_mask: bool = True, **kwargs):
        self.cfg = CifConfig(idim=idim, l_order=l_order, r_order=r_order,
                             threshold=threshold, smooth_factor=smooth_factor,
                             noise_threshold=noise_threshold,
                             tail_threshold=tail_threshold, tail_mask=tail_mask)

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        c = self.cfg
        return {
            "cif_conv1d": conv1d_init(k1, c.idim, c.idim, c.l_order + c.r_order + 1),
            "cif_output": linear_init(k2, c.idim, 1),
        }

    def alphas(self, params, hidden, mask):
        """hidden: (B, T, D); mask: (B, T) bool -> per-frame alphas (B, T) fp32."""
        c = self.cfg
        h = conv1d_apply(params["cif_conv1d"], hidden,
                         left_pad=c.l_order, right_pad=c.r_order)
        h = jax.nn.relu(h)
        out = linear_apply(params["cif_output"], h)[..., 0].astype(jnp.float32)
        a = jax.nn.sigmoid(out)
        a = jax.nn.relu(a * c.smooth_factor - c.noise_threshold)
        if mask is not None:
            a = a * mask.astype(jnp.float32)
        return a

    def __call__(self, params, hidden, mask, max_tokens: int,
                 target_length=None):
        """Returns (acoustic_embeds (B,K,D), token_num (B,), alphas (B,T+1), fires).

        With ``target_length`` (training) alphas are rescaled so each row sums to its
        target token count; otherwise the tail-threshold fire is appended
        (inference), matching reference ``forward:252-312``.
        """
        c = self.cfg
        b, t, d = hidden.shape
        a = self.alphas(params, hidden, mask)
        token_num = jnp.sum(a, axis=1)

        if target_length is not None:
            tgt = target_length.astype(jnp.float32)
            a = a * (tgt / jnp.maximum(token_num, 1e-9))[:, None]
            hidden_c, alphas_c = hidden, a
            out_token_num = token_num
        elif c.tail_threshold > 0.0:
            # append tail fire: one extra frame of zeros; alpha[len] += tail_threshold
            lens = (jnp.sum(mask.astype(jnp.int32), axis=1)
                    if mask is not None else jnp.full((b,), t, jnp.int32))
            a_pad = jnp.pad(a, ((0, 0), (0, 1)))
            tail = jax.nn.one_hot(lens, t + 1, dtype=jnp.float32) * c.tail_threshold
            alphas_c = a_pad + tail
            hidden_c = jnp.pad(hidden, ((0, 0), (0, 1), (0, 0)))
            out_token_num = jnp.floor(jnp.sum(alphas_c, axis=1))
        else:
            hidden_c, alphas_c = hidden, a
            out_token_num = token_num

        acoustic_embeds, fires = cif(hidden_c, alphas_c, max_tokens, c.threshold)
        return acoustic_embeds, out_token_num, alphas_c, fires

    # ------------------------------------------------------------------
    # streaming: sequential integrate with carried state
    # ------------------------------------------------------------------

    def forward_chunk(self, params, hidden, state, max_tokens: int, is_final=False,
                      chunk_size=None):
        """Chunked CIF (reference ``forward_chunk:316-412`` semantics).

        ``state``: {"integrate": (B,), "frame": (B, D)} — the raw (integrate, weighted
        frame) carry; mathematically identical to the reference's normalized
        pseudo-frame trick. ``chunk_size`` [pad_left, stride, lookahead] zeroes alphas
        outside the current stride (the lookahead frames re-arrive next chunk).
        ``is_final`` appends the tail-threshold fire. Runs as one jitted program
        per (shape, flags) — the streaming hot path.
        """
        return _cif_chunk_jit(self, params, hidden, state, max_tokens,
                              bool(is_final),
                              tuple(chunk_size) if chunk_size is not None
                              else None)

    def _forward_chunk_impl(self, params, hidden, state, max_tokens: int,
                            is_final=False, chunk_size=None):
        c = self.cfg
        b, t, d = hidden.shape
        a = self.alphas(params, hidden, None)  # (B, T)
        if chunk_size is not None:
            pos = jnp.arange(t)[None, :]
            keep = (pos >= chunk_size[0])
            if not is_final:
                keep &= pos < (chunk_size[0] + chunk_size[1])
            a = a * keep.astype(a.dtype)
        if is_final:
            a = jnp.concatenate([a, jnp.full((b, 1), c.tail_threshold, jnp.float32)], 1)
            hidden = jnp.concatenate([hidden, jnp.zeros((b, 1, d), hidden.dtype)], 1)
            t = t + 1

        carry = (state["integrate"], state["frame"])
        hid_f = hidden.astype(jnp.float32)
        (integrate, frame), (fire_mask, fired_frames) = jax.lax.scan(
            lambda cr, ah: cif_scan_step(cr, ah, c.threshold),
            carry,
            (a.swapaxes(0, 1), hid_f.swapaxes(0, 1)),
        )
        fire_mask = fire_mask.swapaxes(0, 1)          # (B, T)
        fired_frames = fired_frames.swapaxes(0, 1)    # (B, T, D)

        # compact fired frames to the front of a (B, max_tokens, D) bucket
        n_fired = jnp.sum(fire_mask, axis=1).astype(jnp.int32)
        order = jnp.argsort(~fire_mask, axis=1, stable=True)  # fired positions first
        gathered = jnp.take_along_axis(fired_frames, order[..., None], axis=1)
        k = min(max_tokens, t)
        embeds = gathered[:, :k, :]
        valid = jnp.arange(k)[None, :] < n_fired[:, None]
        embeds = jnp.where(valid[..., None], embeds, 0.0).astype(hidden.dtype)
        new_state = {"integrate": integrate, "frame": frame}
        return embeds, n_fired, new_state

    @staticmethod
    def init_state(batch: int, dim: int):
        return {
            "integrate": jnp.zeros((batch,), jnp.float32),
            "frame": jnp.zeros((batch, dim), jnp.float32),
        }


@partial(jax.jit,
         static_argnames=("self", "max_tokens", "is_final", "chunk_size"))
def _cif_chunk_jit(self, params, hidden, state, max_tokens, is_final,
                   chunk_size):
    return self._forward_chunk_impl(params, hidden, state, max_tokens,
                                    is_final, chunk_size)


def mae_token_loss(token_num, pre_token_length, normalize_length: bool = False):
    """L1 token-count loss (reference ``mae_loss`` at ``cif_predictor.py:741-766``)."""
    norm = token_num.shape[0] if not normalize_length else jnp.sum(token_num)
    return jnp.sum(jnp.abs(token_num.astype(jnp.float32) - pre_token_length)) / norm


@tables.register("predictor_classes", "CifPredictor")
@tables.register("predictor_classes", "CifPredictorV2Export")
@tables.register("predictor_classes", "CifPredictorV3Export")
class CifPredictorV1(CifPredictorV2):
    """CIF v1 (reference ``paraformer/cif_predictor.py:17``): identical math to V2
    except the alpha head uses a DEPTHWISE conv (groups=idim) with a residual
    before the relu. The *Export names alias here too — jax.export needs no
    wrapper modules (reference export wrappers only rewrite torch graph ops)."""

    def init(self, rng):
        from funasr_tpu.core.layers import depthwise_conv1d_init
        k1, k2 = jax.random.split(rng)
        c = self.cfg
        return {
            "cif_conv1d": depthwise_conv1d_init(k1, c.idim,
                                                c.l_order + c.r_order + 1,
                                                bias=True),
            "cif_output": linear_init(k2, c.idim, 1),
        }

    def alphas(self, params, hidden, mask):
        from funasr_tpu.core.layers import depthwise_conv1d_apply
        c = self.cfg
        mem = depthwise_conv1d_apply(params["cif_conv1d"], hidden,
                                     left_pad=c.l_order, right_pad=c.r_order)
        h = jax.nn.relu(mem + hidden)
        a = jax.nn.sigmoid(
            linear_apply(params["cif_output"], h)[..., 0].astype(jnp.float32))
        a = jax.nn.relu(a * c.smooth_factor - c.noise_threshold)
        if mask is not None:
            a = a * mask.astype(jnp.float32)
        return a
