"""Overlap-chunk training masks for streaming SAN-M (SCAMA, arXiv 2006.01713).

Counterpart of the reference ``funasr/models/scama/chunk_utilis.py:10``
(``overlap_chunk``): the offline training forward of a streaming encoder splits
the sequence into overlapping chunks (duplicating context frames) and restricts
attention to the own chunk plus a bounded look-back — so training sees exactly
the receptive field streaming inference will have.

The reference assembles its masks by concatenating per-chunk blocks; here every
mask is written in closed form over row/column index grids (same results,
vectorized numpy). Masks are built host-side per (max_len, chunk-config) and fed
to the jitted encoder as arrays.

Layout (shift = chunk_size + shfit_fsmn): chunk ``c`` owns chunked rows
``[c*shift, (c+1)*shift)`` — first ``shfit_fsmn`` rows are zero-padding for the
FSMN memory conv, then ``chunk_size`` frame rows covering source positions
``[c*stride - pad_left, c*stride - pad_left + chunk_size)`` of the original
sequence (left-padded by ``pad_left``).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


class OverlapChunk:
    def __init__(self, chunk_size=(16,), stride=(10,), pad_left=(0,),
                 encoder_att_look_back_factor=(1,), shfit_fsmn: int = 0,
                 decoder_att_look_back_factor=(1,)):
        def ext(x):
            x = tuple(x)
            return x if len(x) >= len(chunk_size) else tuple(
                x[0] for _ in chunk_size)

        self.chunk_size = tuple(chunk_size)
        self.stride = ext(stride)
        self.pad_left = ext(pad_left)
        self.enc_look_back = ext(encoder_att_look_back_factor)
        self.dec_look_back = ext(decoder_att_look_back_factor)
        self.shfit_fsmn = shfit_fsmn

    def random_choice(self, rng: np.random.Generator = None) -> int:
        """Pick a chunk config index (training samples uniformly;
        reference ``random_choice:123``)."""
        if len(self.chunk_size) <= 1:
            return 0
        rng = rng or np.random.default_rng()
        return int(rng.integers(0, len(self.chunk_size)))

    def gen_chunk_mask(self, x_len: np.ndarray, ind: int = 0):
        """x_len: (B,) -> dict of masks + chunked lengths (all numpy)."""
        x_len = np.asarray(x_len)
        c_sz, s_sz = self.chunk_size[ind], self.stride[ind]
        p_left = self.pad_left[ind]
        lb = self.enc_look_back[ind]
        s_fsmn = self.shfit_fsmn
        shift = c_sz + s_fsmn

        l_max = int(x_len.max())
        n_chunks_row = np.ceil(x_len / s_sz).astype(np.int64)
        x_len_chunk = ((n_chunks_row - 1) * shift + s_fsmn + p_left + x_len
                       - (n_chunks_row - 1) * s_sz).astype(x_len.dtype)
        n = int(math.ceil(l_max / s_sz))
        lc_max = int(x_len_chunk.max())
        l_pad = max(c_sz, l_max + p_left)

        rows = np.arange(n * shift)
        chunk_of = rows // shift
        j = rows % shift - s_fsmn          # frame index within chunk, <0 = fsmn pad
        is_frame = j >= 0

        # split matrix: chunked row r <- left-padded source col chunk*stride + j
        src = chunk_of * s_sz + np.maximum(j, 0)
        x_add = np.zeros((n * shift, l_pad), np.float32)
        ok = is_frame & (src < l_pad)
        x_add[rows[ok], src[ok]] = 1.0

        # un-split matrix: original pos p = c*stride + i <- chunked row of the
        # stride region (j in [pad_left, pad_left+stride))
        x_rm = np.zeros((l_pad, n * shift), np.float32)
        in_stride = is_frame & (j >= p_left) & (j < p_left + s_sz)
        orig = chunk_of * s_sz + (j - p_left)
        ok = in_stride & (orig < l_pad)
        x_rm[orig[ok], rows[ok]] = 1.0

        # attention: query r1 (frame row) may attend key r2 when same chunk
        # (any frame row) or a look-back chunk's stride-start rows (j < stride
        # on BOTH sides — reference mask_att_chunk_encoder block layout)
        same = chunk_of[:, None] == chunk_of[None, :]
        back = (chunk_of[None, :] < chunk_of[:, None]) & \
               (chunk_of[None, :] >= chunk_of[:, None] - lb) & \
               (j[:, None] < s_sz) & (j[None, :] < s_sz)
        att = (is_frame[:, None] & is_frame[None, :] & (same | back))

        masks = {
            "x_add_mask": x_add[:lc_max, : l_max + p_left],
            "x_rm_mask": x_rm[:l_max, :lc_max],
            "x_len_chunk": x_len_chunk,
            "mask_shfit_chunk": is_frame[:lc_max].astype(np.float32),
            "mask_chunk_predictor": in_stride[:lc_max].astype(np.float32),
            "mask_att_chunk_encoder": att[:lc_max, :lc_max],
            "pad_left": p_left,
        }
        return masks

    # ------------------------------------------------------------------

    @staticmethod
    def split_chunk(x, x_len, masks) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, T, D) -> (B, Tc, D) chunked copy via the split matrix."""
        p_left = masks["pad_left"]
        valid = (jnp.arange(x.shape[1])[None, :] < jnp.asarray(x_len)[:, None])
        x = x * valid[..., None].astype(x.dtype)
        x = jnp.pad(x, ((0, 0), (p_left, 0), (0, 0)))
        add = jnp.asarray(masks["x_add_mask"], x.dtype)
        need = add.shape[1]
        if x.shape[1] < need:
            x = jnp.pad(x, ((0, 0), (0, need - x.shape[1]), (0, 0)))
        x_chunk = jnp.einsum("ct,btd->bcd", add, x[:, :need])
        return x_chunk, jnp.asarray(masks["x_len_chunk"], jnp.int32)

    @staticmethod
    def remove_chunk(x_chunk, x_len_chunk, masks):
        """(B, Tc, D) -> (B, T, D) original layout (stride regions)."""
        valid = (jnp.arange(x_chunk.shape[1])[None, :]
                 < jnp.asarray(x_len_chunk)[:, None])
        x_chunk = x_chunk * valid[..., None].astype(x_chunk.dtype)
        rm = jnp.asarray(masks["x_rm_mask"], x_chunk.dtype)
        x = jnp.einsum("tc,bcd->btd", rm[:, : x_chunk.shape[1]], x_chunk)
        # per-row original lengths are the pre-chunk lengths (caller keeps them)
        return x
