"""MFCCA: multi-frame cross-channel attention ASR (multichannel meetings).

TPU-native rebuild of FunASR ``funasr/models/mfcca/`` lineage: per-channel features
fuse through cross-channel attention (each frame attends over its channel axis),
then a standard AED stack decodes. Accepts (B, C, T, F) features or multichannel
waveforms averaged by the loader.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import layer_norm_apply, layer_norm_init
from funasr_tpu.models.transformer.attention import MHAConfig, mha_apply, mha_init
from funasr_tpu.models.transformer.model import Transformer
from funasr_tpu.register import tables


@tables.register("model_classes", "MFCCA")
class MFCCA(Transformer):
    def __init__(self, channel_attention_heads: int = 4, max_channels: int = 8,
                 **kwargs):
        super().__init__(**kwargs)
        self.channel_heads = channel_attention_heads
        self.max_channels = max_channels
        self.input_size = kwargs.get("input_size", 80)

    def init_params(self, rng):
        params = super().init_params(rng)
        k = jax.random.fold_in(rng, 77)
        params["channel_attn"] = mha_init(
            k, MHAConfig(self.channel_heads, self.input_size))
        params["channel_norm"] = layer_norm_init(self.input_size)
        return params

    def fuse_channels(self, params, feats):
        """(B, C, T, F) -> (B, T, F): frames attend across channels, mean-fused."""
        b, c, t, f = feats.shape
        x = feats.transpose(0, 2, 1, 3).reshape(b * t, c, f)
        h = layer_norm_apply(params["channel_norm"], x)
        fused = x + mha_apply(params["channel_attn"],
                              MHAConfig(self.channel_heads, f), h, h, h, None)
        return fused.mean(axis=1).reshape(b, t, f)

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths, rng):
        if speech.ndim == 4:
            speech = self.fuse_channels(params, speech)
        return super().forward_jit(params, speech, speech_lengths, text,
                                   text_lengths, rng)

    def encode(self, params, speech, speech_lengths, rng=None):
        if speech.ndim == 4:
            speech = self.fuse_channels(params, speech)
        return super().encode(params, speech, speech_lengths, rng=rng)
