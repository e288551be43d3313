"""Low Frame Rate (LFR) stacking and CMVN, TPU-native.

Behavior matches the reference frontend (FunASR ``funasr/frontends/wav_frontend.py``:
``apply_lfr:63-86`` — stack ``lfr_m`` frames with stride ``lfr_n``, left context =
replicated first frame ((m-1)//2 copies), tail = replicated last frame; ``apply_cmvn:46``
— ``(x + means) * vars`` from a Kaldi AddShift/Rescale ``am.mvn`` file).

Implemented as a clamped gather: window index ``i*n + j - (m-1)//2`` clipped to
``[0, len-1]`` reproduces replicate padding on both ends with fully static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def lfr_out_len(t, lfr_n: int):
    return -(-t // lfr_n)  # ceil


def apply_lfr(feats, lfr_m: int, lfr_n: int, length=None):
    """feats: (T, D) -> (ceil(T/n), m*D). ``length`` (traced ok) clamps the tail."""
    t, d = feats.shape
    t_lfr = lfr_out_len(t, lfr_n)
    last = (length if length is not None else t) - 1
    idx = jnp.arange(t_lfr)[:, None] * lfr_n + jnp.arange(lfr_m)[None, :] - (lfr_m - 1) // 2
    idx = jnp.clip(idx, 0, last)
    return feats[idx].reshape(t_lfr, lfr_m * d)


def apply_lfr_batch(feats, lengths, lfr_m: int, lfr_n: int):
    """(B, T, D) + (B,) -> ((B, ceil(T/n), m*D), (B,) lfr lengths)."""
    b, t, d = feats.shape
    t_lfr = lfr_out_len(t, lfr_n)
    last = jnp.maximum(lengths - 1, 0)[:, None, None]
    idx = (
        jnp.arange(t_lfr)[None, :, None] * lfr_n
        + jnp.arange(lfr_m)[None, None, :]
        - (lfr_m - 1) // 2
    )
    idx = jnp.clip(idx, 0, last)  # (B, T_lfr, m)
    out = jnp.take_along_axis(feats[:, :, None, :], idx[..., None], axis=1)
    out = out.reshape(b, t_lfr, lfr_m * d)
    out_lens = -(-lengths // lfr_n)
    return out, out_lens.astype(jnp.int32)


def apply_cmvn(feats, means, istd):
    """(..., D) -> (x + means) * istd (kaldi AddShift then Rescale)."""
    return (feats + means) * istd


def load_cmvn(cmvn_file: str) -> np.ndarray:
    """Parse a Kaldi-format ``am.mvn`` (AddShift means + Rescale vars) -> (2, D) fp32.

    Same file format the reference consumes (``wav_frontend.py:15-43``).
    """
    with open(cmvn_file, "r", encoding="utf-8") as f:
        lines = f.readlines()
    means, istd = None, None
    for i, line in enumerate(lines):
        item = line.split()
        if not item:
            continue
        if item[0] == "<AddShift>":
            nxt = lines[i + 1].split()
            if nxt[0] == "<LearnRateCoef>":
                means = np.array(nxt[3 : len(nxt) - 1], dtype=np.float32)
        elif item[0] == "<Rescale>":
            nxt = lines[i + 1].split()
            if nxt[0] == "<LearnRateCoef>":
                istd = np.array(nxt[3 : len(nxt) - 1], dtype=np.float32)
    if means is None or istd is None:
        raise ValueError(f"could not parse CMVN stats from {cmvn_file}")
    return np.stack([means, istd])
