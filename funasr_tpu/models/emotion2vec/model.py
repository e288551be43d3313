"""emotion2vec: self-supervised speech emotion representation (arXiv 2312.15185).

TPU-native rebuild of FunASR ``funasr/models/emotion2vec/model.py:39`` (data2vec-style
stack): wav2vec2 conv feature extractor over raw waveform (stride prod 320 -> 50 Hz
frames), layernorm + projection, transformer blocks (AltBlock = pre-norm MHA + FFN),
utterance mean-pool, linear head over emotion classes.

Inference contract matches the reference: {"key", "labels", "scores", "feats"} with
``granularity`` utterance/frame and ``extract_embedding``.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import (
    layer_norm_apply, layer_norm_init, linear_apply, linear_init)
from funasr_tpu.models.transformer.attention import MHAConfig, mha_apply, mha_init
from funasr_tpu.register import tables

# wav2vec2 conv stack: (dim, kernel, stride) x7 -> total stride 320, ~50 Hz
CONV_LAYERS = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2

EMOTION_LABELS = ["angry", "disgusted", "fearful", "happy", "neutral", "other",
                  "sad", "surprised", "unknown"]


class E2VConfig(NamedTuple):
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    vocab_size: int = 9  # emotion classes

    @property
    def mha(self):
        return MHAConfig(self.num_heads, self.embed_dim)


@tables.register("model_classes", "Emotion2vec")
class Emotion2vec:
    def __init__(self, model_conf: Optional[dict] = None, vocab_size: int = 9,
                 **kwargs):
        conf = dict(model_conf or {})
        self.cfg = E2VConfig(
            embed_dim=conf.get("embed_dim", 768),
            depth=conf.get("depth", 12),
            num_heads=conf.get("num_heads", 12),
            mlp_ratio=conf.get("mlp_ratio", 4.0),
            vocab_size=vocab_size if vocab_size > 0 else 9)

    def init_params(self, rng):
        cfg = self.cfg
        keys = jax.random.split(rng, cfg.depth + 5)
        convs = []
        c_in = 1
        for i, (dim, k, s) in enumerate(CONV_LAYERS):
            bound = 1.0 / np.sqrt(c_in * k)
            convs.append({
                "w": jax.random.uniform(jax.random.fold_in(keys[0], i),
                                        (k, c_in, dim), jnp.float32, -bound, bound),
                "norm": layer_norm_init(dim),
            })
            c_in = dim
        blocks = []
        hidden = int(cfg.embed_dim * cfg.mlp_ratio)
        for i in range(cfg.depth):
            k1, k2, k3 = jax.random.split(keys[1 + i], 3)
            blocks.append({
                "norm1": layer_norm_init(cfg.embed_dim),
                "attn": mha_init(k1, cfg.mha),
                "norm2": layer_norm_init(cfg.embed_dim),
                "fc1": linear_init(k2, cfg.embed_dim, hidden),
                "fc2": linear_init(k3, hidden, cfg.embed_dim),
            })
        params = {
            "local_encoder": convs,
            "post_extract_norm": layer_norm_init(512),
            "post_extract_proj": linear_init(keys[-3], 512, cfg.embed_dim),
            "blocks": blocks,
            "final_norm": layer_norm_init(cfg.embed_dim),
            "proj": linear_init(keys[-2], cfg.embed_dim, cfg.vocab_size),
        }
        return params

    # ------------------------------------------------------------------

    def extract_features(self, params, wav):
        """wav: (B, N) normalized waveform -> (B, T, D) contextual features."""
        h = wav[:, :, None]  # (B, N, 1)
        for conv, (dim, k, s) in zip(params["local_encoder"], CONV_LAYERS):
            h = jax.lax.conv_general_dilated(
                h, conv["w"].astype(h.dtype), window_strides=(s,), padding="VALID",
                dimension_numbers=("NTC", "TIO", "NTC"),
                preferred_element_type=jnp.float32).astype(h.dtype)
            h = jax.nn.gelu(layer_norm_apply(conv["norm"], h), approximate=False)
        h = layer_norm_apply(params["post_extract_norm"], h)
        h = linear_apply(params["post_extract_proj"], h)
        cfg = self.cfg
        for bp in params["blocks"]:
            res = h
            x = layer_norm_apply(bp["norm1"], h)
            h = res + mha_apply(bp["attn"], cfg.mha, x, x, x, None)
            res = h
            x = layer_norm_apply(bp["norm2"], h)
            x = linear_apply(bp["fc2"], jax.nn.gelu(linear_apply(bp["fc1"], x),
                                                    approximate=False))
            h = res + x
        return layer_norm_apply(params["final_norm"], h)

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, **kwargs):
        from funasr_tpu.utils.load_utils import load_audio_text_image_video

        granularity = kwargs.get("granularity", "utterance")
        extract_embedding = kwargs.get("extract_embedding", True)
        audio_list = load_audio_text_image_video(
            data_in, fs=16000, audio_fs=kwargs.get("fs", 16000))
        results = []
        if key is None:
            key = [f"rand_key_{i}" for i in range(len(audio_list))]
        for i, wav in enumerate(audio_list):
            w = np.asarray(wav, np.float32)
            w = (w - w.mean()) / (w.std() + 1e-5)  # utterance norm (fairseq style)
            feats = np.asarray(self.extract_features(params, jnp.asarray(w)[None]))[0]
            utt = feats.mean(axis=0)
            logits = np.asarray(linear_apply(params["proj"],
                                             jnp.asarray(utt)[None]))[0]
            scores = np.exp(logits - logits.max())
            scores = scores / scores.sum()
            n = min(len(EMOTION_LABELS), scores.shape[0])
            result = {"key": key[i],
                      "labels": EMOTION_LABELS[:n],
                      "scores": [round(float(s), 4) for s in scores[:n]]}
            if extract_embedding:
                result["feats"] = feats if granularity == "frame" else utt
            results.append(result)
        return results, {}
