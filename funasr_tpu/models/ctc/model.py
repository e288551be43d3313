"""Pure-CTC ASR model (encoder + CTC head, greedy decode).

TPU-native rebuild of FunASR ``funasr/models/ctc/model.py:17`` (registered as
model class "CTC"): any registered encoder, optax CTC loss, greedy collapse at
inference. The whole decode is one jitted argmax + host collapse.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import make_pad_mask
from funasr_tpu.models.ctc.ctc import CTC
from funasr_tpu.register import tables


@tables.register("model_classes", "CTC")
class CTCModel:
    def __init__(self, specaug: Optional[str] = None,
                 specaug_conf: Optional[Dict] = None,
                 encoder: str = "SANMEncoder", encoder_conf: Optional[Dict] = None,
                 ctc_conf: Optional[Dict] = None, input_size: int = 80,
                 vocab_size: int = -1, ignore_id: int = -1, blank_id: int = 0,
                 sos: int = 1, eos: int = 2, **kwargs):
        self.encoder = tables.encoder_classes[encoder](
            input_size=input_size, **(encoder_conf or {}))
        self.ctc = CTC(odim=vocab_size, encoder_output_size=self.encoder.output_size(),
                       **(ctc_conf or {}))
        self.specaug = (tables.specaug_classes[specaug](**(specaug_conf or {}))
                        if specaug else None)
        self.vocab_size = vocab_size
        self.blank_id = blank_id
        self.ignore_id = ignore_id
        self.sos, self.eos = sos, eos

    def init_params(self, rng):
        k1, k2 = jax.random.split(rng)
        return {"encoder": self.encoder.init(k1), "ctc": self.ctc.init(k2)}

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths, rng):
        if self.specaug is not None and rng is not None:
            speech, speech_lengths = self.specaug(speech, speech_lengths, rng)
        enc, enc_lens = self.encoder(params["encoder"], speech, speech_lengths,
                                     rng=rng)
        loss = self.ctc.loss(params["ctc"], enc, enc_lens, text, text_lengths)
        return loss, {"loss": loss, "loss_ctc": loss,
                      "batch_size": speech.shape[0]}, speech.shape[0]

    def infer_jit(self, params, speech, speech_lengths):
        enc, enc_lens = self.encoder(params["encoder"], speech, speech_lengths)
        logits = self.ctc.logits(params["ctc"], enc)
        path = jnp.argmax(logits, -1).astype(jnp.int32)
        valid = make_pad_mask(enc_lens, enc.shape[1])
        return jnp.where(valid, path, self.blank_id), enc_lens

    def inference(self, params, data_in, data_lengths=None,
                  key: Optional[List] = None, tokenizer=None, frontend=None,
                  **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)
        from funasr_tpu.utils import postprocess_utils

        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs if frontend else 16000,
            audio_fs=kwargs.get("fs", 16000))
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)
        path, _ = self.infer_jit(params, jnp.asarray(speech),
                                 jnp.asarray(speech_lengths))
        path = np.asarray(path)
        if key is None:
            key = [f"rand_key_{i}" for i in range(path.shape[0])]
        results = []
        for i in range(path.shape[0]):
            seq = path[i]
            out, prev = [], self.blank_id
            for t in seq:
                t = int(t)
                if t != self.blank_id and t != prev:
                    out.append(t)
                prev = t
            if tokenizer is not None:
                token = tokenizer.ids2tokens(out)
                text, _ = postprocess_utils.sentence_postprocess(token)
                results.append({"key": key[i], "text": text})
            else:
                results.append({"key": key[i], "token_int": out})
        return results, {}
