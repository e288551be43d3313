"""data2vec audio SSL pretraining (teacher-student masked regression).

TPU-native rebuild of FunASR ``funasr/models/data2vec/`` (fairseq lineage): the
student transformer sees masked conv features and regresses the EMA teacher's
top-K-layer-averaged representations at masked positions (smooth-L1). The EMA teacher
update is a pure pytree op (``ema_update``), applied by the trainer between steps.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from typing import NamedTuple

from funasr_tpu.core.layers import (
    layer_norm_apply, layer_norm_init, linear_apply, linear_init)
from funasr_tpu.models.transformer.attention import MHAConfig, mha_apply, mha_init
from funasr_tpu.register import tables

# wav2vec2/data2vec conv feature extractor spec: (channels, kernel, stride)
CONV_LAYERS = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2


class D2VConfig(NamedTuple):
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0

    @property
    def mha(self) -> MHAConfig:
        return MHAConfig(n_head=self.num_heads, n_feat=self.embed_dim)


@tables.register("model_classes", "Data2VecAudio")
@tables.register("model_classes", "data2vec")
class Data2VecAudio:
    def __init__(self, model_conf: Optional[dict] = None, mask_prob: float = 0.65,
                 mask_length: int = 10, top_k_layers: int = 8,
                 ema_decay: float = 0.999, **kwargs):
        conf = dict(model_conf or {})
        self.cfg = D2VConfig(embed_dim=conf.get("embed_dim", 768),
                             depth=conf.get("depth", 12),
                             num_heads=conf.get("num_heads", 12),
                             mlp_ratio=conf.get("mlp_ratio", 4.0))
        self.mask_prob = mask_prob
        self.mask_length = mask_length
        self.top_k_layers = min(top_k_layers, self.cfg.depth)
        self.ema_decay = ema_decay

    def init_params(self, rng):
        cfg = self.cfg
        d = cfg.embed_dim
        hid = int(d * cfg.mlp_ratio)
        keys = iter(jax.random.split(rng, 12 + cfg.depth * 3))
        import math
        student = {"local_encoder": [], "blocks": []}
        c_in = 1
        for (c_out, k, _s) in CONV_LAYERS:
            student["local_encoder"].append({
                "w": jax.random.normal(next(keys), (k, c_in, c_out))
                * (1.0 / math.sqrt(k * c_in)),
                "norm": layer_norm_init(c_out),
            })
            c_in = c_out
        student["post_extract_norm"] = layer_norm_init(CONV_LAYERS[-1][0])
        student["post_extract_proj"] = linear_init(next(keys),
                                                   CONV_LAYERS[-1][0], d)
        for _ in range(cfg.depth):
            student["blocks"].append({
                "norm1": layer_norm_init(d),
                "attn": mha_init(next(keys), cfg.mha),
                "norm2": layer_norm_init(d),
                "fc1": linear_init(next(keys), d, hid),
                "fc2": linear_init(jax.random.fold_in(next(keys), 1), hid, d),
            })
        student["mask_emb"] = jax.random.normal(next(keys), (d,)) * 0.02
        student["regression_head"] = linear_init(next(keys), d, d)
        teacher = jax.tree_util.tree_map(lambda x: x, student)
        return {"student": student, "teacher": teacher}

    # ------------------------------------------------------------------

    def _trunk_layers(self, params, wav, mask_bool=None):
        """Run conv front + blocks, returning every block's output (for teacher
        top-K averaging)."""
        h = wav[:, :, None]
        for conv, (dim, k, s) in zip(params["local_encoder"], CONV_LAYERS):
            h = jax.lax.conv_general_dilated(
                h, conv["w"].astype(h.dtype), window_strides=(s,), padding="VALID",
                dimension_numbers=("NTC", "TIO", "NTC"),
                preferred_element_type=jnp.float32).astype(h.dtype)
            h = jax.nn.gelu(layer_norm_apply(conv["norm"], h), approximate=False)
        h = layer_norm_apply(params["post_extract_norm"], h)
        h = linear_apply(params["post_extract_proj"], h)
        if mask_bool is not None:
            h = jnp.where(mask_bool[..., None], params["mask_emb"].astype(h.dtype), h)
        outs = []
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
            outs.append(h)
        return outs

    def _sample_mask(self, rng, b: int, t: int):
        starts = jax.random.bernoulli(rng, self.mask_prob / self.mask_length,
                                      (b, t))
        # dilate starts into spans of mask_length
        mask = jnp.zeros((b, t), bool)
        for i in range(self.mask_length):
            mask = mask | jnp.roll(starts, i, axis=1)
        return mask

    def forward_jit(self, params, speech, speech_lengths, text=None,
                    text_lengths=None, rng=None):
        """speech: (B, N) raw waveform. Returns the masked-regression loss."""
        wav = speech
        if wav.ndim == 3:  # accept (B, N, 1)
            wav = wav[..., 0]
        # frame count after the conv stack
        n = wav.shape[1]
        t = n
        for _, k, s in CONV_LAYERS:
            t = (t - k) // s + 1
        mask = self._sample_mask(rng, wav.shape[0], t)

        teacher_layers = self._trunk_layers(params["teacher"], wav, None)
        target = jnp.mean(jnp.stack(teacher_layers[-self.top_k_layers:]), axis=0)
        target = jax.lax.stop_gradient(
            (target - target.mean(-1, keepdims=True))
            / (target.std(-1, keepdims=True) + 1e-6))

        student_layers = self._trunk_layers(params["student"], wav, mask)
        pred = linear_apply(params["student"]["regression_head"],
                            student_layers[-1])

        diff = (pred - target).astype(jnp.float32)
        beta = 2.0  # smooth-l1 beta (fairseq loss_beta)
        sl1 = jnp.where(jnp.abs(diff) < beta, 0.5 * diff * diff / beta,
                        jnp.abs(diff) - 0.5 * beta)
        m = mask[..., None].astype(jnp.float32)
        loss = jnp.sum(sl1 * m) / jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)
        return loss, {"loss": loss, "masked_frames": jnp.sum(mask)}, wav.shape[0]

    def ema_update(self, params):
        """teacher <- decay * teacher + (1-decay) * student (call between steps)."""
        d = self.ema_decay
        new_teacher = jax.tree_util.tree_map(
            lambda t, s: d * t + (1 - d) * s, params["teacher"],
            {k: v for k, v in params["student"].items()
             if k in params["teacher"]})
        return {"student": params["student"], "teacher": new_teacher}
