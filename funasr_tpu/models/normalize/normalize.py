"""Feature normalization (reference: ``funasr/models/normalize/global_mvn.py:12``,
``utterance_mvn.py:9``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import make_pad_mask
from funasr_tpu.register import tables


@tables.register("normalize_classes", "GlobalMVN")
class GlobalMVN:
    """Normalize with precomputed global stats (kaldi-style stats file or npy)."""

    def __init__(self, stats_file: str, norm_means: bool = True,
                 norm_vars: bool = True, eps: float = 1.0e-20, **kwargs):
        self.norm_means = norm_means
        self.norm_vars = norm_vars
        self.eps = eps
        stats = np.load(stats_file)
        if isinstance(stats, np.ndarray):
            # espnet format: stats[0, :-1]=sum, stats[1, :-1]=sq_sum, stats[0, -1]=count
            count = stats[0].flatten()[-1]
            mean = stats[0, :-1] / count
            var = stats[1, :-1] / count - mean * mean
        else:
            mean, var = stats["mean"], stats["var"]
        self.mean = jnp.asarray(mean, jnp.float32)
        self.istd = jnp.asarray(1.0 / np.sqrt(np.maximum(var, eps)), jnp.float32)

    def __call__(self, x, lengths):
        if self.norm_means:
            x = x - self.mean
        if self.norm_vars:
            x = x * self.istd
        return x, lengths


@tables.register("normalize_classes", "UtteranceMVN")
class UtteranceMVN:
    def __init__(self, norm_means: bool = True, norm_vars: bool = False,
                 eps: float = 1.0e-20, **kwargs):
        self.norm_means = norm_means
        self.norm_vars = norm_vars
        self.eps = eps

    def __call__(self, x, lengths):
        mask = make_pad_mask(lengths, x.shape[1])[..., None].astype(x.dtype)
        n = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(x * mask, axis=1, keepdims=True) / n
        if self.norm_means:
            x = (x - mean) * mask
        if self.norm_vars:
            centered = x if self.norm_means else (x - mean) * mask
            var = jnp.sum(jnp.square(centered), axis=1, keepdims=True) / n
            x = x / jnp.sqrt(var + self.eps)
        return x, lengths
