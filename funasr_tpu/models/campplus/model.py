"""CAM++ speaker embedding (192-d), TPU-native.

Rebuild of FunASR ``funasr/models/campplus/model.py:42-200``: FCM resnet front ->
TDNN(5, stride 2) -> 3 CAM-dense-TDNN blocks (12/24/16 layers, growth 32) with transit
halvings -> stats pooling -> 192-d dense. Feature: kaldi fbank 80 mel with per-utterance
mean subtraction (``campplus/utils.py extract_feature``), dither 1.0 at train / 0 here.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import conv1d_apply, conv1d_init
from funasr_tpu.models.campplus.components import (
    batchnorm_apply, batchnorm_init, bn_relu, cam_dense_tdnn_layer_apply,
    cam_dense_tdnn_layer_init, fcm_apply, fcm_init, stats_pool, tdnn_layer_apply,
    tdnn_layer_init)
from funasr_tpu.register import tables

BLOCKS = ((12, 3, 1), (24, 3, 2), (16, 3, 2))  # (num_layers, kernel, dilation)


@tables.register("model_classes", "CAMPPlus")
class CAMPPlus:
    def __init__(self, feat_dim: int = 80, embedding_size: int = 192,
                 growth_rate: int = 32, bn_size: int = 4, init_channels: int = 128,
                 output_level: str = "segment", **kwargs):
        self.feat_dim = feat_dim
        self.embedding_size = embedding_size
        self.growth_rate = growth_rate
        self.bn_size = bn_size
        self.init_channels = init_channels
        self.output_level = output_level
        self._jit_forward = jax.jit(self.forward)

    def init_params(self, rng):
        keys = jax.random.split(rng, 8)
        fcm_out = 32 * (self.feat_dim // 8)
        p = {"head": fcm_init(keys[0], 32, self.feat_dim),
             "xvector": {"tdnn": tdnn_layer_init(keys[1], fcm_out,
                                                 self.init_channels, 5)}}
        channels = self.init_channels
        for i, (num_layers, kernel, dilation) in enumerate(BLOCKS):
            layers = []
            for j in range(num_layers):
                layers.append(cam_dense_tdnn_layer_init(
                    jax.random.fold_in(keys[2 + i], j),
                    channels + j * self.growth_rate, self.growth_rate,
                    self.bn_size * self.growth_rate, kernel))
            p["xvector"][f"block{i + 1}"] = layers
            channels += num_layers * self.growth_rate
            p["xvector"][f"transit{i + 1}"] = {
                "nonlinear": batchnorm_init(channels),
                "linear": conv1d_init(jax.random.fold_in(keys[5], i), channels,
                                      channels // 2, 1, bias=False)}
            channels //= 2
        p["xvector"]["out_nonlinear"] = batchnorm_init(channels)
        if self.output_level == "segment":
            p["xvector"]["dense"] = {
                "linear": conv1d_init(keys[6], channels * 2, self.embedding_size, 1,
                                      bias=False),
                "nonlinear": batchnorm_init(self.embedding_size, affine=False)}
        return p

    def forward(self, params, x):
        """x: (B, T, feat_dim) mean-normalized fbank -> (B, embedding_size)."""
        h = fcm_apply(params["head"], x)
        xv = params["xvector"]
        h = tdnn_layer_apply(xv["tdnn"], h, kernel=5, stride=2)
        for i, (num_layers, kernel, dilation) in enumerate(BLOCKS):
            for lp in xv[f"block{i + 1}"]:
                out = cam_dense_tdnn_layer_apply(lp, h, kernel=kernel,
                                                 dilation=dilation)
                h = jnp.concatenate([h, out], axis=-1)
            tp = xv[f"transit{i + 1}"]
            h = conv1d_apply(tp["linear"], bn_relu(tp["nonlinear"], h))
        h = bn_relu(xv["out_nonlinear"], h)
        if self.output_level == "frame":
            return h
        pooled = stats_pool(h)  # (B, 2C)
        emb = conv1d_apply(xv["dense"]["linear"], pooled[:, None, :])[:, 0]
        emb = batchnorm_apply(xv["dense"]["nonlinear"], emb)
        return emb

    # ------------------------------------------------------------------

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, **kwargs):
        """Returns [{"spk_embedding": (B, 192) np}] over the batch of clips
        (reference contract ``model.py:160-200``)."""
        from funasr_tpu.ops.fbank import fbank
        from funasr_tpu.utils.load_utils import (as_pcm16_f32,
                                                 load_audio_text_image_video)

        meta: Dict = {}
        t0 = time.perf_counter()
        audio_list = load_audio_text_image_video(
            data_in, fs=16000, audio_fs=kwargs.get("fs", 16000), data_type="sound")
        meta["load_data"] = f"{time.perf_counter() - t0:0.3f}"

        feats = []
        maxlen = 0
        for au in audio_list:
            f = np.asarray(fbank(jnp.asarray(as_pcm16_f32(au)),
                                 num_mel_bins=self.feat_dim))
            f = f - f.mean(axis=0, keepdims=True)
            feats.append(f)
            maxlen = max(maxlen, f.shape[0])
        batch = np.zeros((len(feats), maxlen, self.feat_dim), np.float32)
        for i, f in enumerate(feats):
            batch[i, : f.shape[0]] = f
        meta["batch_data_time"] = sum(len(a) for a in audio_list) / 16000.0

        embs = np.asarray(self._jit_forward(params, jnp.asarray(batch)))
        return [{"spk_embedding": embs}], meta
