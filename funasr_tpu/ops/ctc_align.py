"""CTC forced alignment (viterbi over the blank-interleaved label graph).

Counterpart of FunASR ``funasr/utils/ctc_forced_align.py`` (used by SenseVoice
timestamps, ``sense_voice/model.py:1036-1076``, and Fun-ASR-Nano). Host numpy
implementation — alignment tables are tiny (T x 2L+1) relative to model compute; a
Pallas scan variant can replace it if alignment ever shows up in profiles.
"""

from __future__ import annotations

import numpy as np

NEG_INF = -1e30


def ctc_forced_align(log_probs: np.ndarray, targets: np.ndarray,
                     input_length: int = None, target_length: int = None,
                     blank_id: int = 0) -> np.ndarray:
    """log_probs: (T, V) log-softmax; targets: (L,) label ids ->
    per-frame aligned label ids (T,) with blanks (the viterbi path)."""
    log_probs = np.asarray(log_probs, np.float64)
    targets = np.asarray(targets, np.int64)
    t_len = input_length if input_length is not None else log_probs.shape[0]
    l_len = target_length if target_length is not None else targets.shape[0]
    log_probs = log_probs[:t_len]
    targets = targets[:l_len]

    # extended sequence: blank l1 blank l2 ... blank lL blank
    ext = np.full((2 * l_len + 1,), blank_id, np.int64)
    ext[1::2] = targets
    s = len(ext)

    dp = np.full((t_len, s), NEG_INF)
    bp = np.zeros((t_len, s), np.int64)
    dp[0, 0] = log_probs[0, ext[0]]
    if s > 1:
        dp[0, 1] = log_probs[0, ext[1]]

    for t in range(1, t_len):
        prev = dp[t - 1]
        # candidates: stay (j), from j-1, from j-2 (only if labels differ & non-blank)
        stay = prev
        from1 = np.concatenate([[NEG_INF], prev[:-1]])
        from2 = np.concatenate([[NEG_INF, NEG_INF], prev[:-2]])
        can_skip = np.zeros(s, bool)
        can_skip[2:] = (ext[2:] != blank_id) & (ext[2:] != ext[:-2])
        from2 = np.where(can_skip, from2, NEG_INF)
        stacked = np.stack([stay, from1, from2])  # (3, S)
        best = np.argmax(stacked, axis=0)
        dp[t] = stacked[best, np.arange(s)] + log_probs[t, ext]
        bp[t] = np.arange(s) - best

    # end at last blank or last label
    j = s - 1 if s == 1 or dp[-1, s - 1] >= dp[-1, s - 2] else s - 2
    path = np.zeros(t_len, np.int64)
    for t in range(t_len - 1, -1, -1):
        path[t] = ext[j]
        j = bp[t, j] if t > 0 else j
    return path


def ctc_forced_align_batch(log_probs, targets, input_lengths, target_lengths,
                           blank_id: int = 0, ignore_id: int = -1):
    """(B, T, V), (B, L) -> (B, T) aligned paths (padded frames = blank)."""
    b, t, _ = log_probs.shape
    out = np.full((b, t), blank_id, np.int64)
    for i in range(b):
        tl = int(input_lengths[i])
        ll = int(target_lengths[i])
        tg = np.asarray(targets[i][:ll])
        tg = tg[tg != ignore_id]
        out[i, :tl] = ctc_forced_align(np.asarray(log_probs[i]), tg, tl, len(tg),
                                       blank_id)
    return out


# ----------------------------------------------------------------------
# jit/TPU-native variant (lax.scan viterbi + backtrack)
# ----------------------------------------------------------------------

def ctc_forced_align_jax(log_probs, targets, input_lengths, target_lengths,
                         blank_id: int = 0):
    """Batched jittable forced alignment.

    log_probs: (B, T, V) log-softmax; targets: (B, L) label ids (padding
    arbitrary); lengths (B,). Returns ``target_idx`` (B, T) int32: the target
    position [0..L) each frame is aligned to, or -1 for blank/padded frames —
    the "alignment → target index" map of reference
    ``paraformer_v2_community/model.py:366-398`` fused into the viterbi.

    Static shapes, O(T·L) per sample, vmapped over the batch; runs entirely
    on-device (unlike :func:`ctc_forced_align_batch`).
    """
    import jax
    import jax.numpy as jnp

    def one(logp, tgt, t_len, l_len):
        t_max, _ = logp.shape
        l_max = tgt.shape[0]
        s_max = 2 * l_max + 1
        s_idx = jnp.arange(s_max)
        is_lab = (s_idx % 2) == 1
        lab_pos = jnp.clip((s_idx - 1) // 2, 0, l_max - 1)
        ext = jnp.where(is_lab, tgt[lab_pos], blank_id)
        state_valid = s_idx <= 2 * l_len
        prev_lab = jnp.clip((s_idx - 3) // 2, 0, l_max - 1)
        can_skip = is_lab & (s_idx >= 2) & (tgt[lab_pos] != tgt[prev_lab])

        alpha0 = jnp.full((s_max,), NEG_INF, jnp.float32)
        alpha0 = alpha0.at[0].set(logp[0, blank_id])
        alpha0 = jnp.where((s_idx == 1) & (l_len > 0),
                           logp[0, ext[1]], alpha0)
        alpha0 = jnp.where(state_valid, alpha0, NEG_INF)

        def step(alpha, t):
            emit = logp[t, ext]
            stay = alpha
            from1 = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
            from2 = jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]])
            from2 = jnp.where(can_skip, from2, NEG_INF)
            stacked = jnp.stack([stay, from1, from2])  # (3, S)
            choice = jnp.argmax(stacked, axis=0).astype(jnp.int32)
            best = jnp.max(stacked, axis=0)
            new = jnp.where(state_valid, best + emit, NEG_INF)
            frozen = t >= t_len
            alpha_out = jnp.where(frozen, alpha, new)
            choice = jnp.where(frozen, 0, choice)
            return alpha_out, choice

        alpha, choices = jax.lax.scan(step, alpha0, jnp.arange(1, t_max))
        # choices: (T-1, S); choices[i] = transition into frame i+1
        end_a = alpha[jnp.clip(2 * l_len, 0, s_max - 1)]
        end_b = alpha[jnp.clip(2 * l_len - 1, 0, s_max - 1)]
        end_s = jnp.where((l_len == 0) | (end_a >= end_b),
                          2 * l_len, 2 * l_len - 1)

        def back(s, t):
            s_prev = s - choices[t - 1, s]
            return jnp.where(t >= 1, s_prev, s), s

        _, states = jax.lax.scan(back, end_s, jnp.arange(t_max - 1, -1, -1))
        states = states[::-1]  # (T,)
        idx = jnp.where((states % 2) == 1, (states - 1) // 2, -1)
        idx = jnp.where(jnp.arange(t_max) < t_len, idx, -1)
        return idx.astype(jnp.int32)

    import jax as _jax
    return _jax.vmap(one)(log_probs, targets, input_lengths, target_lengths)
