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
