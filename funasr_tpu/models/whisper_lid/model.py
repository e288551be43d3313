"""Whisper-encoder + ERes2Net language identification (LID).

TPU-native rebuild of FunASR ``funasr/models/whisper_lid/model.py:524``
(``OpenAIWhisperLIDModel``): a Whisper encoder produces frame features, an
ERes2Net backbone (``lid_predictor.py:10`` LidPredictor) pools them into one
utterance embedding, and a linear head classifies the language. ``clip_frames``
optionally restricts scoring to a fixed window (random offset in training,
prefix at inference — reference ``forward:605-640``).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import linear_apply, linear_init
from funasr_tpu.losses.label_smoothing_loss import label_smoothing_loss
from funasr_tpu.models.eres2net.model import ERes2NetV2
from funasr_tpu.models.whisper.model import WhisperModel
from funasr_tpu.register import tables

tables.register("lid_predictor_classes", "LidPredictor")(ERes2NetV2)


@tables.register("model_classes", "OpenAIWhisperLIDModel")
@tables.register("model_classes", "WhisperLID")
class OpenAIWhisperLIDModel:
    def __init__(self, vocab_size: int, encoder: str = "whisper-small",
                 encoder_conf: Optional[Dict] = None,
                 lid_predictor: str = "LidPredictor",
                 lid_predictor_conf: Optional[Dict] = None,
                 proj_dim: int = 80, clip_frames: Optional[int] = None,
                 random_clip: bool = False, **kwargs):
        enc_conf = dict(encoder_conf or {})
        size = enc_conf.pop("whisper_size", encoder if encoder.startswith("whisper")
                            else "whisper-small")
        self.encoder = WhisperModel(whisper_size=size, **enc_conf)
        pred_conf = dict(lid_predictor_conf or {})
        pred_conf.setdefault("feat_dim", proj_dim)
        self.lid_predictor = tables.lid_predictor_classes[lid_predictor](**pred_conf)
        self.proj_dim = proj_dim
        self.vocab_size = vocab_size
        self.clip_frames = clip_frames
        self.random_clip = random_clip
        self.d_model = self.encoder.cfg.d_model

    def init_params(self, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        p = {
            "encoder": self.encoder.init_params(k1)["encoder"],
            "lid_predictor": self.lid_predictor.init_params(k2),
            "output_layer": linear_init(
                k3, self.lid_predictor.embedding_size, self.vocab_size),
        }
        if self.d_model != self.proj_dim:
            p["proj_layer"] = linear_init(k4, self.d_model, self.proj_dim)
        return p

    def _features(self, params, speech, speech_lengths):
        enc, _ = self.encoder.encode({"encoder": params["encoder"]}, speech,
                                     speech_lengths)
        if "proj_layer" in params:
            enc = linear_apply(params["proj_layer"], enc)
        if self.clip_frames is not None:
            enc = enc[:, : self.clip_frames]
        return enc

    def logits(self, params, speech, speech_lengths):
        feats = self._features(params, speech, speech_lengths)
        emb = self.lid_predictor.forward(params["lid_predictor"], feats)
        return linear_apply(params["output_layer"], emb)

    def forward_jit(self, params, speech, speech_lengths, lid, lid_lengths, rng=None):
        logits = self.logits(params, speech, speech_lengths)
        loss = label_smoothing_loss(logits[:, None, :], lid[:, :1],
                                    ignore_id=-1, smoothing=0.0,
                                    vocab_size=self.vocab_size,
                                    normalize_length=False)
        acc = jnp.mean((jnp.argmax(logits, -1) == lid[:, 0]).astype(jnp.float32))
        stats = {"loss": loss, "acc_lid": acc, "batch_size": speech.shape[0]}
        return loss, stats, speech.shape[0]

    def inference(self, params, data_in, data_lengths=None,
                  key: Optional[List] = None, tokenizer=None, frontend=None,
                  **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)

        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs if frontend else 16000,
            audio_fs=kwargs.get("fs", 16000))
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)
        logits = np.asarray(self.logits(params, jnp.asarray(speech),
                                        jnp.asarray(speech_lengths)))
        ids = logits.argmax(-1)
        if key is None:
            key = [f"rand_key_{i}" for i in range(len(ids))]
        results = []
        for i, lid in enumerate(ids):
            text = (tokenizer.ids2tokens([int(lid)])[0] if tokenizer is not None
                    else str(int(lid)))
            results.append({"key": key[i], "text": text,
                            "lid_logits": logits[i].tolist()})
        return results, {}
