"""Static-shape bucketing policy.

XLA compiles one program per input shape; unconstrained audio lengths would recompile
per utterance. Every host->device boundary in this framework pads to a bucket from a
geometric grid, bounding the number of compiled programs to O(log(max_len)) while
wasting at most ``ratio``-1 compute.
"""

from __future__ import annotations

import math


def bucket_length(n: int, *, minimum: int = 16, ratio: float = 1.25,
                  multiple: int = 16) -> int:
    """Smallest grid value >= n: geometric grid (factor ``ratio``) snapped up to
    ``multiple`` (keeps the last-two-dims tiling friendly)."""
    n = max(int(n), 1)
    b = minimum
    while b < n:
        b = int(math.ceil(b * ratio))
    return ((b + multiple - 1) // multiple) * multiple


def bucket_batch(b: int) -> int:
    """Next power of two >= b: bounds batch-shape program count to O(log B)."""
    return 1 << max(int(b) - 1, 0).bit_length()


def bucket_frames(t: int, multiple: int = 128) -> int:
    """Encoder frame-count bucket: snap up to a multiple of 128 (MXU tile edge).

    Linear grid, not geometric: offline ASR segments are VAD-bounded (<=60 s =>
    ~1000 LFR frames), so the program count stays <= T_max/128 while padding
    waste shrinks as 1/T for the long segments that dominate compute.
    """
    return max(multiple, -(-int(t) // multiple) * multiple)


def pad_feats_bucketed(speech, lengths, t_multiple: int = 128):
    """Pad a (B, T, D) feature batch to (bucket_batch(B), bucket_frames(T), D).

    Extra batch rows replicate row 0 (a fully-masked row would softmax over an
    empty set); extra frames are zeros (masked off by ``lengths``). Returns
    (speech_padded, lengths_padded, real_b).

    Accepts numpy OR jax arrays; jax inputs stay on device (the frontend's
    device-native path feeds the model without a host round trip).
    """
    import numpy as np

    if not isinstance(speech, np.ndarray) and hasattr(speech, "devices"):
        import jax.numpy as jnp

        b, t = speech.shape[0], speech.shape[1]
        bb, tb = bucket_batch(b), bucket_frames(t, t_multiple)
        if tb > t:
            speech = jnp.pad(speech, ((0, 0), (0, tb - t)) +
                             ((0, 0),) * (speech.ndim - 2))
        if bb > b:
            speech = jnp.concatenate(
                [speech, jnp.broadcast_to(speech[:1], (bb - b,) + speech.shape[1:])])
            lengths = jnp.concatenate(
                [jnp.asarray(lengths, jnp.int32),
                 jnp.broadcast_to(jnp.asarray(lengths, jnp.int32)[:1], (bb - b,))])
        return speech, jnp.asarray(lengths, jnp.int32), b

    speech = np.asarray(speech)
    lengths = np.asarray(lengths, np.int32)
    b, t = speech.shape[0], speech.shape[1]
    bb, tb = bucket_batch(b), bucket_frames(t, t_multiple)
    if bb == b and tb == t:
        return speech, lengths, b
    out = np.zeros((bb, tb) + speech.shape[2:], speech.dtype)
    out[:b, :t] = speech
    if bb > b:
        out[b:] = out[0]
    lens = np.concatenate([lengths, np.full((bb - b,), lengths[0], np.int32)])
    return out, lens, b


def pad_to_bucket(arr, axis: int = 0, **kwargs):
    """Pad a numpy array along ``axis`` up to its bucket length."""
    import numpy as np
    n = arr.shape[axis]
    b = bucket_length(n, **kwargs)
    if b == n:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, b - n)
    return np.pad(arr, pad)
