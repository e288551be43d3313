"""SOND: speaker overlap-aware neural diarization, and the x-vector SV model.

TPU-native rebuilds of FunASR ``funasr/models/sond/e2e_diar_sond.py:45``
(speech encoder + speaker encoder + context-independent/context-dependent scorers +
post-net emitting power-set labels) and ``funasr/models/xvector/e2e_sv.py:47``
(TDNN x-vector speaker embedding).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import (
    linear_apply, linear_init, lstm_apply, lstm_init, make_pad_mask)
from funasr_tpu.models.campplus.components import stats_pool, tdnn_layer_apply, \
    tdnn_layer_init
from funasr_tpu.register import tables


@tables.register("model_classes", "XVector")
@tables.register("model_classes", "ESPnetSVModel")
class XVector:
    """TDNN x-vector: 5 dilated TDNN layers -> stats pool -> embedding."""

    TDNN_PLAN = [(512, 5, 1), (512, 3, 2), (512, 3, 3), (512, 1, 1), (1500, 1, 1)]

    def __init__(self, input_size: int = 80, embedding_size: int = 512, **kwargs):
        self.input_size = input_size
        self.embedding_size = embedding_size

    def init_params(self, rng):
        keys = jax.random.split(rng, len(self.TDNN_PLAN) + 1)
        layers = []
        c_in = self.input_size
        for i, (dim, k, d) in enumerate(self.TDNN_PLAN):
            layers.append(tdnn_layer_init(keys[i], c_in, dim, k))
            c_in = dim
        return {"tdnn": layers,
                "embedding": linear_init(keys[-1], c_in * 2, self.embedding_size)}

    def forward(self, params, feats):
        h = feats
        for lp, (dim, k, d) in zip(params["tdnn"], self.TDNN_PLAN):
            h = tdnn_layer_apply(lp, h, kernel=k, dilation=d)
        pooled = stats_pool(h)
        return linear_apply(params["embedding"], pooled)

    def inference(self, params, data_in, data_lengths=None, key=None,
                  tokenizer=None, frontend=None, **kwargs):
        from funasr_tpu.ops.fbank import fbank
        from funasr_tpu.utils.load_utils import load_audio_text_image_video
        audio_list = load_audio_text_image_video(
            data_in, fs=16000, audio_fs=kwargs.get("fs", 16000))
        feats = []
        maxlen = 0
        for au in audio_list:
            f = np.asarray(fbank(jnp.asarray(au * 32768.0),
                                 num_mel_bins=self.input_size))
            f = f - f.mean(0, keepdims=True)
            feats.append(f)
            maxlen = max(maxlen, f.shape[0])
        batch = np.zeros((len(feats), maxlen, self.input_size), np.float32)
        for i, f in enumerate(feats):
            batch[i, : f.shape[0]] = f
        embs = np.asarray(self.forward(params, jnp.asarray(batch)))
        return [{"spk_embedding": embs}], {}


@tables.register("model_classes", "DiarSondModel")
@tables.register("model_classes", "SOND")
class DiarSondModel:
    """SOND diarization: given speech + candidate speaker profiles, emit per-frame
    per-speaker activity. CI scorer = cosine(frame_emb, profile); CD scorer = LSTM
    over [frame || profile] interactions; post-net fuses both."""

    def __init__(self, encoder: str = "SANMEncoder", encoder_conf: Optional[dict] = None,
                 input_size: int = 80, spk_embed_dim: int = 192,
                 max_speakers: int = 16, **kwargs):
        enc_conf = dict(encoder_conf or {})
        enc_conf.setdefault("output_size", 256)
        self.encoder = tables.encoder_classes[encoder](input_size=input_size,
                                                       **enc_conf)
        self.d = self.encoder.output_size()
        self.spk_embed_dim = spk_embed_dim
        self.max_speakers = max_speakers

    def init_params(self, rng):
        keys = jax.random.split(rng, 5)
        return {
            "encoder": self.encoder.init(keys[0]),
            "spk_proj": linear_init(keys[1], self.spk_embed_dim, self.d),
            "cd_lstm": lstm_init(keys[2], 2 * self.d, self.d),
            "post_net": linear_init(keys[3], self.d + 1, 1),
        }

    def scores(self, params, feats, feat_lengths, profiles):
        """feats (B,T,F), profiles (B,S,E) -> activity logits (B,T,S)."""
        enc, enc_lens = self.encoder(params["encoder"], feats, feat_lengths)
        prof = linear_apply(params["spk_proj"], profiles)  # (B, S, D)
        # CI: scaled cosine similarity
        e_n = enc / (jnp.linalg.norm(enc, axis=-1, keepdims=True) + 1e-6)
        p_n = prof / (jnp.linalg.norm(prof, axis=-1, keepdims=True) + 1e-6)
        ci = jnp.einsum("btd,bsd->bts", e_n, p_n,
                        preferred_element_type=jnp.float32)
        # CD: LSTM over time of [frame || profile] per speaker
        b, t, d = enc.shape
        s = prof.shape[1]
        pair = jnp.concatenate(
            [jnp.repeat(enc[:, None], s, 1).reshape(b * s, t, d),
             jnp.repeat(prof[:, :, None], t, 2).reshape(b * s, t, d)], axis=-1)
        cd = lstm_apply(params["cd_lstm"], pair).reshape(b, s, t, d) \
            .transpose(0, 2, 1, 3)
        fused = jnp.concatenate([cd, ci[..., None]], axis=-1)
        logits = linear_apply(params["post_net"], fused)[..., 0]
        return logits, enc_lens

    def forward_jit(self, params, feats, feat_lengths, profiles, labels, rng=None):
        logits, enc_lens = self.scores(params, feats, feat_lengths, profiles)
        t = logits.shape[1]
        mask = make_pad_mask(enc_lens, t)[..., None].astype(jnp.float32)
        y = labels[:, :t].astype(jnp.float32)
        p = jax.nn.sigmoid(logits.astype(jnp.float32))
        eps = 1e-7
        bce = -(y * jnp.log(p + eps) + (1 - y) * jnp.log(1 - p + eps)) * mask
        loss = jnp.sum(bce) / jnp.maximum(jnp.sum(mask) * y.shape[-1], 1.0)
        return loss, {"loss": loss}, feats.shape[0]

    def inference(self, params, data_in, data_lengths=None, key=None,
                  tokenizer=None, frontend=None, profiles=None, **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)
        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs if frontend else 16000,
            audio_fs=kwargs.get("fs", 16000))
        feats, feat_lens = extract_fbank(audio_list, frontend=frontend)
        assert profiles is not None, "SOND requires candidate speaker profiles"
        logits, enc_lens = self.scores(params, jnp.asarray(feats),
                                       jnp.asarray(feat_lens),
                                       jnp.asarray(profiles))
        probs = np.asarray(jax.nn.sigmoid(logits))
        enc_lens = np.asarray(enc_lens)
        thr = kwargs.get("threshold", 0.5)
        frame_ms = kwargs.get("frame_shift_ms", 10)
        results = []
        if key is None:
            key = [f"rand_key_{i}" for i in range(probs.shape[0])]
        for i in range(probs.shape[0]):
            active = probs[i, : enc_lens[i]] > thr
            segs = []
            for s in range(active.shape[1]):
                on = None
                for t_i in range(active.shape[0]):
                    if active[t_i, s] and on is None:
                        on = t_i
                    elif not active[t_i, s] and on is not None:
                        segs.append([s, on * frame_ms, t_i * frame_ms])
                        on = None
                if on is not None:
                    segs.append([s, on * frame_ms, active.shape[0] * frame_ms])
            results.append({"key": key[i], "value": sorted(segs,
                                                           key=lambda x: x[1])})
        return results, {}
