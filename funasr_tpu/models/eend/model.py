"""EEND-OLA: end-to-end neural diarization with encoder-decoder attractors.

TPU-native rebuild of FunASR ``funasr/models/eend/e2e_diar_eend_ola.py:90`` (+
``encoder_decoder_attractor.py``): transformer encoder over stacked features -> EDA
(LSTM encoder over frame embeddings; LSTM decoder unrolled from zero inputs emits one
attractor per speaker + an existence counter) -> per-frame speaker activities
sigmoid(frame . attractor), plus the power-set (PSE) label head used by OLA.

Training: PIT-free attractor-order loss (activities vs labels, existence BCE);
inference: thresholded activities -> [[spk, start_ms, end_ms], ...].
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import (
    linear_apply, linear_init, lstm_apply, lstm_init, make_pad_mask)
from funasr_tpu.register import tables


@tables.register("model_classes", "DiarEENDOLA")
@tables.register("model_classes", "EENDOLA")
class DiarEENDOLA:
    def __init__(self, encoder: str = "TransformerEncoder",
                 encoder_conf: Optional[dict] = None, input_size: int = 345,
                 n_units: int = 256, max_n_speaker: int = 8,
                 attractor_threshold: float = 0.5, frame_shift_ms: int = 100,
                 **kwargs):
        import funasr_tpu.models.transformer.encoder  # noqa: F401
        enc_conf = dict(encoder_conf or {})
        enc_conf.setdefault("output_size", n_units)
        enc_conf.setdefault("input_layer", "linear")
        self.encoder = tables.encoder_classes[encoder](input_size=input_size,
                                                       **enc_conf)
        self.n_units = self.encoder.output_size()
        self.max_n_speaker = max_n_speaker
        self.attractor_threshold = attractor_threshold
        self.frame_shift_ms = frame_shift_ms

    def init_params(self, rng):
        keys = jax.random.split(rng, 5)
        return {
            "encoder": self.encoder.init(keys[0]),
            "eda_encoder": lstm_init(keys[1], self.n_units, self.n_units),
            "eda_decoder": lstm_init(keys[2], self.n_units, self.n_units),
            "counter": linear_init(keys[3], self.n_units, 1),
        }

    # ------------------------------------------------------------------

    def _attractors(self, params, emb, n_spk: int):
        """emb: (B, T, D) frame embeddings -> (attractors (B, n_spk+1, D),
        existence logits (B, n_spk+1))."""
        # EDA encoder: summarize frames into (h, c); decoder unrolls from zeros
        h_seq = lstm_apply(params["eda_encoder"], emb)
        h_last = h_seq[:, -1]  # (B, D) final hidden as the summary state

        b = emb.shape[0]
        zeros = jnp.zeros((b, n_spk + 1, self.n_units), emb.dtype)
        # decoder LSTM initialized by broadcasting summary into the carry via
        # prepending it as the first input step
        dec_in = jnp.concatenate([h_last[:, None, :], zeros], axis=1)
        dec_out = lstm_apply(params["eda_decoder"], dec_in)[:, 1:]
        exist_logits = linear_apply(params["counter"], dec_out)[..., 0]
        return dec_out, exist_logits

    def activities(self, params, speech, speech_lengths, n_spk: Optional[int] = None):
        """-> (per-frame speaker activity probs (B, T, S), existence probs
        (B, S+1), enc_lens)."""
        emb, enc_lens = self.encoder(params["encoder"], speech, speech_lengths)
        s = n_spk if n_spk is not None else self.max_n_speaker
        attractors, exist_logits = self._attractors(params, emb, s)
        logits = jnp.einsum("btd,bsd->bts", emb, attractors[:, :s],
                            preferred_element_type=jnp.float32)
        return jax.nn.sigmoid(logits), jax.nn.sigmoid(exist_logits), enc_lens

    def forward_jit(self, params, speech, speech_lengths, labels, label_lengths,
                    rng=None):
        """labels: (B, T, S) binary speaker activities. PIT over speaker
        permutations (max_n_speaker <= 4 recommended for exact PIT in training)."""
        probs, exist, enc_lens = self.activities(params, speech, speech_lengths,
                                                 labels.shape[-1])
        t = probs.shape[1]
        mask = make_pad_mask(enc_lens, t)[..., None].astype(jnp.float32)
        labels = labels[:, :t].astype(jnp.float32)

        def bce(p, y):
            eps = 1e-7
            per = -(y * jnp.log(p + eps) + (1 - y) * jnp.log(1 - p + eps))
            return jnp.sum(per * mask, axis=(1, 2))

        s = labels.shape[-1]
        perms = list(itertools.permutations(range(s)))
        losses = jnp.stack([bce(probs[:, :, list(p)], labels) for p in perms], 1)
        pit = jnp.min(losses, axis=1)
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        loss_diar = jnp.sum(pit) / denom
        # existence: speakers 0..n_active-1 exist, the (n_active)'th stops
        n_active = jnp.sum(jnp.max(labels, axis=1) > 0.5, axis=-1)
        tgt_exist = (jnp.arange(exist.shape[1])[None] < n_active[:, None]) \
            .astype(jnp.float32)
        eps = 1e-7
        loss_exist = -jnp.mean(tgt_exist * jnp.log(exist + eps)
                               + (1 - tgt_exist) * jnp.log(1 - exist + eps))
        loss = loss_diar + loss_exist
        return loss, {"loss": loss, "loss_diar": loss_diar,
                      "loss_exist": loss_exist}, speech.shape[0]

    # ------------------------------------------------------------------

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)

        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs if frontend else 8000,
            audio_fs=kwargs.get("fs", 16000))
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)
        probs, exist, enc_lens = self.activities(
            params, jnp.asarray(speech), jnp.asarray(speech_lengths))
        probs = np.asarray(probs)
        exist = np.asarray(exist)
        enc_lens = np.asarray(enc_lens)

        results = []
        if key is None:
            key = [f"rand_key_{i}" for i in range(probs.shape[0])]
        thr = kwargs.get("threshold", 0.5)
        for i in range(probs.shape[0]):
            n_spk = int((exist[i] > self.attractor_threshold).sum())
            n_spk = max(min(n_spk, self.max_n_speaker), 0)
            active = probs[i, : enc_lens[i], :n_spk] > thr
            segments = []
            for s in range(n_spk):
                on = None
                for t in range(active.shape[0]):
                    if active[t, s] and on is None:
                        on = t
                    elif not active[t, s] and on is not None:
                        segments.append([s, on * self.frame_shift_ms,
                                         t * self.frame_shift_ms])
                        on = None
                if on is not None:
                    segments.append([s, on * self.frame_shift_ms,
                                     active.shape[0] * self.frame_shift_ms])
            results.append({"key": key[i], "n_speakers": n_spk,
                            "value": sorted(segments, key=lambda x: x[1])})
        return results, {}
