"""SCAMA decoder-attention alignment utilities.

TPU-native rebuilds of reference ``funasr/models/paraformer/cif_predictor.py:144``
(``gen_frame_alignments``) and ``funasr/models/scama/chunk_utilis.py:482``
(``build_scama_mask_for_cross_attention_decoder``): both are cumsum/compare
constructions over static shapes, so they jit cleanly — no python loops, no
dynamic shapes.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

from funasr_tpu.core.layers import make_pad_mask


def gen_frame_alignments(alphas, encoder_lengths, max_token_num: int,
                         training: bool = True):
    """CIF alphas (B, T) -> per-frame emitted-token counts (B, T) int32.

    Frame ``t`` gets a 1 for each token whose CIF integration completes at
    ``t`` (ref cif_predictor.py:144-204). ``max_token_num`` must be static
    (use the target-length axis during training).
    """
    b, t = alphas.shape
    token_num = jnp.round(jnp.sum(alphas, axis=1)) if training \
        else jnp.floor(jnp.sum(alphas, axis=1))
    token_num = token_num.astype(jnp.int32)

    cums = jnp.floor(jnp.cumsum(alphas, axis=1)).astype(jnp.int32)  # (B, T)
    index = jnp.arange(1, max_token_num + 1, dtype=jnp.int32)  # (K,)
    # first frame where cumulative count >= k: count frames with cums//k == 0
    zeros = (cums[:, None, :] // index[None, :, None]) == 0  # (B, K, T)
    first_fire = jnp.sum(zeros.astype(jnp.int32), axis=-1) + 1  # (B, K), 1-based
    max_len = jnp.max(encoder_lengths)
    first_fire = jnp.clip(first_fire, 0, max_len)
    valid_tok = make_pad_mask(token_num, max_token_num)
    first_fire = first_fire * valid_tok.astype(jnp.int32)

    frame_idx = jnp.arange(1, t + 1, dtype=jnp.int32)  # 1-based frame positions
    hits = (first_fire[:, :, None] == frame_idx[None, None, :])  # (B, K, T)
    alignments = jnp.sum(hits.astype(jnp.int32), axis=1)
    alignments = alignments * make_pad_mask(encoder_lengths, t).astype(jnp.int32)
    return alignments, jnp.sum(alignments, axis=-1)


def build_scama_mask_for_cross_attention_decoder(
        predictor_alignments, encoder_sequence_length, max_target_length: int,
        chunk_size: int = 1, encoder_chunk_size: int = 5,
        attention_chunk_center_bias: int = 0,
        attention_chunk_size: Optional[int] = None,
        attention_chunk_type: str = "chunk",
        predictor_mask_chunk_hopping=None,
        decoder_att_look_back_factor: int = 1,
        mask_shift_att_chunk_decoder=None,
        target_length=None, is_training: bool = True):
    """Per-target-token encoder attention window (ref chunk_utilis.py:482-624).

    Token ``k`` may attend up to the end of the chunk in which it fired, with
    ``decoder_att_look_back_factor`` chunks of look-back; fsmn-pad rows and
    hopping rows are excluded via the chunked-layout masks.
    Returns (B, max_target_length, T_enc) float mask.
    """
    b, t_enc = predictor_alignments.shape
    max_enc = t_enc
    if not is_training or target_length is None:
        target_length = jnp.sum(predictor_alignments, axis=-1)
    k_axis = jnp.arange(1, max_target_length + 1, dtype=jnp.int32)
    cums = jnp.cumsum(predictor_alignments, axis=1)  # (B, T)
    zeros = (cums[:, None, :] // k_axis[None, :, None]) == 0  # (B, K, T)
    fire_pos = jnp.sum(zeros.astype(jnp.int32), axis=-1) + 1  # (B, K)
    fire_pos = jnp.clip(fire_pos, 1, t_enc)

    end = fire_pos * chunk_size + attention_chunk_center_bias
    end = jnp.clip(end - 1, 0, max_enc)
    # round up to the chunk boundary
    end = (end // encoder_chunk_size + 1) * encoder_chunk_size
    max_len_chunk = int(math.ceil(max_enc / encoder_chunk_size)
                        * encoder_chunk_size)
    cols = jnp.arange(max_len_chunk, dtype=jnp.int32)

    mask = (cols[None, None, :] < end[:, :, None]).astype(jnp.float32)
    mask_flip = mask_flip2 = None
    if attention_chunk_size is not None:
        beg = jnp.clip(end - attention_chunk_size, 0, max_len_chunk)
        mask_flip = (cols[None, None, :] >= beg[:, :, None]).astype(jnp.float32)
        beg2 = jnp.clip(
            end - attention_chunk_size * (decoder_att_look_back_factor + 1),
            0, max_len_chunk)
        mask_flip2 = (cols[None, None, :] >= beg2[:, :, None]) \
            .astype(jnp.float32)

    if predictor_mask_chunk_hopping is not None:
        hop = jnp.asarray(predictor_mask_chunk_hopping, jnp.float32)
        if hop.ndim == 1:
            hop = jnp.broadcast_to(hop[None], (b, hop.shape[0]))
        hop = jnp.pad(hop, ((0, 0), (0, max_len_chunk - hop.shape[1])))
        hop = jnp.broadcast_to(hop[:, None, :],
                               (b, max_target_length, max_len_chunk))
        mask_mask_flip = mask * mask_flip if mask_flip is not None else mask
        if max_len_chunk > chunk_size:
            # own-chunk rows always visible; earlier chunks only their
            # stride (non-hopping) rows (ref chunk_utilis.py:576-603)
            mask_sliced = jnp.pad(mask[:, :, encoder_chunk_size:],
                                  ((0, 0), (0, 0), (0, encoder_chunk_size)))
            mask = mask_mask_flip + mask_sliced * hop
        else:
            mask = mask_mask_flip
    if mask_flip2 is not None:
        mask = mask * mask_flip2

    mask = jnp.minimum(mask, 1.0)
    tgt_valid = make_pad_mask(target_length, max_target_length) \
        .astype(jnp.float32)
    mask = mask[:, :, :max_enc] * tgt_valid[:, :, None]
    enc_valid = make_pad_mask(encoder_sequence_length, max_enc) \
        .astype(jnp.float32)
    mask = mask * enc_valid[:, None, :]
    if attention_chunk_type == "full":
        mask = jnp.ones_like(mask)
    if mask_shift_att_chunk_decoder is not None:
        shift = jnp.asarray(mask_shift_att_chunk_decoder, jnp.float32)
        if shift.ndim == 1:
            shift = shift[None, None, :]
        elif shift.ndim == 2:
            shift = shift[:, None, :]
        mask = mask * shift[..., :max_enc]
    return mask
