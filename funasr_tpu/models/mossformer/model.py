"""MossFormer: monaural speech separation (gated single-head attention blocks).

TPU-native rebuild of FunASR ``funasr/models/mossformer/`` lineage: conv encoder over
the waveform -> MossFormer blocks (triple-gated attention: joint local-global
single-head attention with convolutional gating) -> per-source masks -> transposed
conv decoder. Compact functional implementation covering the separation contract:
``inference`` returns N separated waveforms per input.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import (
    conv1d_apply, conv1d_init, conv_transpose1d_apply_stride_eq_kernel,
    conv_transpose1d_init, depthwise_conv1d_apply, depthwise_conv1d_init,
    layer_norm_apply, layer_norm_init, linear_apply, linear_init)
from funasr_tpu.models.transformer.attention import MHAConfig, mha_apply, mha_init
from funasr_tpu.register import tables


def _block_init(rng, d: int, ffn: int, kernel: int):
    keys = jax.random.split(rng, 5)
    return {
        "norm1": layer_norm_init(d),
        "attn": mha_init(keys[0], MHAConfig(1, d)),  # single-head
        "gate_u": linear_init(keys[1], d, d),
        "gate_v": linear_init(keys[2], d, d),
        "conv": depthwise_conv1d_init(keys[3], d, kernel, bias=True),
        "norm2": layer_norm_init(d),
        "ffn1": linear_init(keys[4], d, ffn),
        "ffn2": linear_init(jax.random.fold_in(keys[4], 1), ffn, d),
    }


def _block_apply(p, x, kernel: int):
    res = x
    h = layer_norm_apply(p["norm1"], x)
    att = mha_apply(p["attn"], MHAConfig(1, x.shape[-1]), h, h, h, None)
    # triple gating: u * sigmoid(v) convolved over time
    u = jax.nn.silu(linear_apply(p["gate_u"], h))
    v = jax.nn.sigmoid(linear_apply(p["gate_v"], h))
    pad = (kernel - 1) // 2
    g = depthwise_conv1d_apply(p["conv"], u * v, left_pad=pad, right_pad=pad)
    x = res + att * jax.nn.sigmoid(g)
    res = x
    h = layer_norm_apply(p["norm2"], x)
    h = linear_apply(p["ffn2"], jax.nn.silu(linear_apply(p["ffn1"], h)))
    return res + h


@tables.register("model_classes", "MossFormer")
class MossFormer:
    def __init__(self, num_spks: int = 2, encoder_kernel: int = 16,
                 d_model: int = 256, ffn_dim: int = 1024, num_blocks: int = 8,
                 conv_kernel: int = 17, **kwargs):
        self.num_spks = num_spks
        self.k = encoder_kernel
        self.stride = encoder_kernel // 2
        self.d = d_model
        self.ffn = ffn_dim
        self.num_blocks = num_blocks
        self.conv_kernel = conv_kernel

    def init_params(self, rng):
        keys = jax.random.split(rng, self.num_blocks + 3)
        return {
            "encoder": conv1d_init(keys[0], 1, self.d, self.k, bias=False),
            "blocks": [_block_init(keys[1 + i], self.d, self.ffn, self.conv_kernel)
                       for i in range(self.num_blocks)],
            "mask_head": linear_init(keys[-2], self.d, self.d * self.num_spks),
            # each masked frame decodes to `stride` waveform samples
            "decoder": conv_transpose1d_init(keys[-1], self.d, 1, self.stride),
        }

    def separate(self, params, wav):
        """wav: (B, N) -> (B, num_spks, ~N) separated sources."""
        b, n = wav.shape
        x = wav[:, :, None]
        feats = jax.nn.relu(conv1d_apply(params["encoder"], x, stride=self.stride))
        h = feats
        for bp in params["blocks"]:
            h = _block_apply(bp, h, self.conv_kernel)
        masks = jax.nn.relu(linear_apply(params["mask_head"], h))
        t = feats.shape[1]
        masks = masks.reshape(b, t, self.num_spks, self.d)
        outs = []
        for s in range(self.num_spks):
            masked = feats * masks[:, :, s]
            y = conv_transpose1d_apply_stride_eq_kernel(params["decoder"], masked)
            outs.append(y.reshape(b, -1))
        return jnp.stack(outs, axis=1)

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, **kwargs):
        from funasr_tpu.utils.load_utils import load_audio_text_image_video
        audio_list = load_audio_text_image_video(
            data_in, fs=16000, audio_fs=kwargs.get("fs", 16000))
        results = []
        if key is None:
            key = [f"rand_key_{i}" for i in range(len(audio_list))]
        for i, wav in enumerate(audio_list):
            srcs = np.asarray(self.separate(params,
                                            jnp.asarray(wav, jnp.float32)[None]))[0]
            results.append({"key": key[i],
                            "value": [srcs[s] for s in range(self.num_spks)]})
        return results, {}
