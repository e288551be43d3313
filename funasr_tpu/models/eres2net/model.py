"""ERes2NetV2 speaker embedding (192-d; better than CAM++ for short clips).

TPU-native rebuild of FunASR ``funasr/models/eres2net/eres2netv2.py:185`` +
``fusion.py`` (AFF) + ``model.py:21`` (ERes2NetV2SV): Res2Net blocks (ReLU clipped at
20), AFF attention fusion blocks in layers 3/4, layer3->layer4 downsample fusion,
TSTP pooling, 192-d linear head. NHWC layout ((B, F, T, C)).
"""

from __future__ import annotations

import math
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import linear_apply, linear_init
from funasr_tpu.models.campplus.components import (
    batchnorm_apply, batchnorm_init, conv2d_apply, conv2d_init)
from funasr_tpu.register import tables


def relu20(x):
    return jnp.clip(x, 0.0, 20.0)


def _aff_init(rng, channels: int, r: int = 4):
    inter = channels // r
    k1, k2 = jax.random.split(rng)
    return {"conv1": conv2d_init(k1, channels * 2, inter, 1, 1, bias=True),
            "bn1": batchnorm_init(inter),
            "conv2": conv2d_init(k2, inter, channels, 1, 1, bias=True),
            "bn2": batchnorm_init(channels)}


def _aff_apply(p, x, ds_y):
    xa = jnp.concatenate([x, ds_y], axis=-1)
    h = batchnorm_apply(p["bn1"], conv2d_apply(p["conv1"], xa, padding=(0, 0)))
    h = jax.nn.silu(h)
    att = batchnorm_apply(p["bn2"], conv2d_apply(p["conv2"], h, padding=(0, 0)))
    att = 1.0 + jnp.tanh(att)
    return x * att + ds_y * (2.0 - att)


def _block_init(rng, in_planes, planes, stride, base_width, scale, expansion,
                use_aff):
    width = int(math.floor(planes * (base_width / 64.0)))
    keys = jax.random.split(rng, 3 + 2 * scale)
    p = {"conv1": conv2d_init(keys[0], in_planes, width * scale, 1, 1),
         "bn1": batchnorm_init(width * scale),
         "convs": [], "bns": [], "fuse": [],
         "conv3": conv2d_init(keys[1], width * scale, planes * expansion, 1, 1),
         "bn3": batchnorm_init(planes * expansion)}
    for i in range(scale):
        p["convs"].append(conv2d_init(keys[3 + 2 * i], width, width, 3, 3))
        p["bns"].append(batchnorm_init(width))
    if use_aff:
        for j in range(scale - 1):
            p["fuse"].append(_aff_init(jax.random.fold_in(keys[2], j), width))
    if stride != 1 or in_planes != expansion * planes:
        p["shortcut"] = {"conv": conv2d_init(jax.random.fold_in(keys[2], 99),
                                             in_planes, planes * expansion, 1, 1),
                         "bn": batchnorm_init(planes * expansion)}
    return p


def _block_apply(p, x, stride, width, scale, use_aff):
    out = relu20(batchnorm_apply(p["bn1"], conv2d_apply(
        p["conv1"], x, stride=(stride, stride), padding=(0, 0))))
    spx = jnp.split(out, scale, axis=-1)
    pieces = []
    sp = None
    for i in range(scale):
        if i == 0:
            sp = spx[i]
        elif use_aff:
            sp = _aff_apply(p["fuse"][i - 1], sp, spx[i])
        else:
            sp = sp + spx[i]
        sp = relu20(batchnorm_apply(p["bns"][i], conv2d_apply(p["convs"][i], sp)))
        pieces.append(sp)
    out = jnp.concatenate(pieces, axis=-1)
    out = batchnorm_apply(p["bn3"], conv2d_apply(p["conv3"], out, padding=(0, 0)))
    if "shortcut" in p:
        residual = batchnorm_apply(p["shortcut"]["bn"], conv2d_apply(
            p["shortcut"]["conv"], x, stride=(stride, stride), padding=(0, 0)))
    else:
        residual = x
    return relu20(out + residual)


@tables.register("model_classes", "ERes2NetV2")
class ERes2NetV2:
    def __init__(self, num_blocks=(3, 4, 6, 3), m_channels: int = 64,
                 feat_dim: int = 80, embedding_size: int = 192,
                 baseWidth: int = 26, scale: int = 2, expansion: int = 2,
                 output_level: str = "segment", **kwargs):
        self.num_blocks = list(num_blocks)
        self.m = m_channels
        self.feat_dim = feat_dim
        self.embedding_size = embedding_size
        self.base_width = baseWidth
        self.scale = scale
        self.expansion = expansion
        self.stats_dim = (feat_dim // 8) * m_channels * 8
        self._jit_forward = jax.jit(self.forward)

    def _layer_plan(self):
        """[(planes, n_blocks, stride, use_aff)] for layers 1..4."""
        m = self.m
        return [(m, self.num_blocks[0], 1, False),
                (m * 2, self.num_blocks[1], 2, False),
                (m * 4, self.num_blocks[2], 2, True),
                (m * 8, self.num_blocks[3], 2, True)]

    def init_params(self, rng):
        keys = jax.random.split(rng, 8)
        p = {"conv1": conv2d_init(keys[0], 1, self.m, 3, 3),
             "bn1": batchnorm_init(self.m)}
        in_planes = self.m
        for li, (planes, n, stride, aff) in enumerate(self._layer_plan()):
            layers = []
            strides = [stride] + [1] * (n - 1)
            for bi, s in enumerate(strides):
                layers.append(_block_init(
                    jax.random.fold_in(keys[1 + li], bi), in_planes, planes, s,
                    self.base_width, self.scale, self.expansion, aff))
                in_planes = planes * self.expansion
            p[f"layer{li + 1}"] = layers
        p["layer3_ds"] = conv2d_init(keys[5], self.m * 4 * self.expansion,
                                     self.m * 8 * self.expansion, 3, 3)
        p["fuse34"] = _aff_init(keys[6], self.m * 8 * self.expansion)
        p["seg_1"] = linear_init(keys[7], self.stats_dim * self.expansion * 2,
                                 self.embedding_size)
        return p

    def forward(self, params, x):
        """x: (B, T, F) fbank -> (B, embedding_size)."""
        h = x.transpose(0, 2, 1)[..., None]  # (B, F, T, 1)
        h = relu20(batchnorm_apply(params["bn1"], conv2d_apply(params["conv1"], h)))
        outs = []
        for li, (planes, n, stride, aff) in enumerate(self._layer_plan()):
            width = int(math.floor(planes * (self.base_width / 64.0)))
            strides = [stride] + [1] * (n - 1)
            for bi, s in enumerate(strides):
                h = _block_apply(params[f"layer{li + 1}"][bi], h, s, width,
                                 self.scale, aff)
            outs.append(h)
        out3, out4 = outs[2], outs[3]
        out3_ds = conv2d_apply(params["layer3_ds"], out3, stride=(2, 2),
                               padding=(1, 1))
        fuse = _aff_apply(params["fuse34"], out4, out3_ds)
        # TSTP over time: (B, F', T', C) -> stats over T'
        mean = jnp.mean(fuse, axis=2)
        var = jnp.var(fuse, axis=2, ddof=1)
        std = jnp.sqrt(var + 1e-8)
        # torch flattens (B, C, F') C-major: transpose to (B, C, F') first
        mean = mean.transpose(0, 2, 1).reshape(mean.shape[0], -1)
        std = std.transpose(0, 2, 1).reshape(std.shape[0], -1)
        stats = jnp.concatenate([mean, std], axis=-1)
        return linear_apply(params["seg_1"], stats)

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, **kwargs):
        from funasr_tpu.ops.fbank import fbank
        from funasr_tpu.utils.load_utils import (as_pcm16_f32,
                                                 load_audio_text_image_video)

        meta: Dict = {}
        audio_list = load_audio_text_image_video(
            data_in, fs=16000, audio_fs=kwargs.get("fs", 16000), data_type="sound")
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
        embs = np.asarray(self._jit_forward(params, jnp.asarray(batch)))
        return [{"spk_embedding": embs}], meta
