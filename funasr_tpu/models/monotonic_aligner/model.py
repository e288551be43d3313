"""MonotonicAligner (``fa-zh``): forced alignment — per-char timestamps for given
(audio, text).

TPU-native rebuild of FunASR ``funasr/models/monotonic_aligner/model.py:24-267``:
SAN-M encoder + CifPredictorV3 upsample head scaled to the known token count, then
``ts_prediction_lfr6_standard``.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import funasr_tpu.models.bicif_paraformer.cif_predictor  # noqa: F401
from funasr_tpu.core.layers import make_pad_mask
from funasr_tpu.models.paraformer.cif_predictor import mae_token_loss
from funasr_tpu.register import tables
from funasr_tpu.utils import postprocess_utils
from funasr_tpu.utils.timestamp_tools import ts_prediction_lfr6_standard


@tables.register("model_classes", "MonotonicAligner")
class MonotonicAligner:
    def __init__(self, input_size: int = 80, specaug: Optional[str] = None,
                 specaug_conf: Optional[Dict] = None, normalize: Optional[str] = None,
                 normalize_conf: Optional[Dict] = None,
                 encoder: str = "SANMEncoder", encoder_conf: Optional[Dict] = None,
                 predictor: str = "CifPredictorV3",
                 predictor_conf: Optional[Dict] = None, predictor_bias: int = 0,
                 length_normalized_loss: bool = False, **kwargs):
        self.encoder = tables.encoder_classes[encoder](input_size=input_size,
                                                       **(encoder_conf or {}))
        self.predictor = tables.predictor_classes[predictor](**(predictor_conf or {}))
        self.specaug = (tables.specaug_classes[specaug](**(specaug_conf or {}))
                        if specaug else None)
        self.normalize = (tables.normalize_classes[normalize](**(normalize_conf or {}))
                          if normalize else None)
        self.predictor_bias = predictor_bias
        self.length_normalized_loss = length_normalized_loss

    def init_params(self, rng):
        k1, k2 = jax.random.split(rng)
        return {"encoder": self.encoder.init(k1), "predictor": self.predictor.init(k2)}

    def encode(self, params, speech, speech_lengths, rng=None):
        if self.specaug is not None and rng is not None:
            speech, speech_lengths = self.specaug(speech, speech_lengths, rng)
        if self.normalize is not None:
            speech, speech_lengths = self.normalize(speech, speech_lengths)
        return self.encoder(params["encoder"], speech, speech_lengths, rng=rng)

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths, rng):
        encoder_out, encoder_out_lens = self.encode(params, speech, speech_lengths,
                                                    rng=rng)
        mask = make_pad_mask(encoder_out_lens, encoder_out.shape[1])
        _, _, us_alphas, _ = self.predictor.get_upsample_timestamp(
            params["predictor"], encoder_out, mask)
        token_num2 = jnp.sum(us_alphas, axis=-1)
        loss = mae_token_loss(text_lengths + self.predictor_bias, token_num2,
                              self.length_normalized_loss)
        return loss, {"loss": loss, "loss_pre": loss}, speech.shape[0]

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, **kwargs):
        """data_in: list of (audio, text) pairs or parallel lists with
        data_type=("sound", "text") (reference contract)."""
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)

        meta: Dict = {}
        # split paired inputs
        if isinstance(data_in, (list, tuple)) and len(data_in) and \
                isinstance(data_in[0], (list, tuple)):
            audio_in = [d[0] for d in data_in]
            text_in = [d[1] for d in data_in]
        else:
            audio_in, text_in = data_in, kwargs.get("text")
        t0 = time.perf_counter()
        audio_list = load_audio_text_image_video(
            audio_in, fs=frontend.fs, audio_fs=kwargs.get("fs", 16000))
        meta["load_data"] = f"{time.perf_counter() - t0:0.3f}"
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)
        meta["batch_data_time"] = (float(np.sum(speech_lengths))
                                   * frontend.frame_shift_ms * frontend.lfr_n / 1000)

        token_lists = [tokenizer.encode(t) if isinstance(t, str) else list(t)
                       for t in (text_in if isinstance(text_in, list) else [text_in])]
        token_nums = np.asarray(
            [len(t) + self.predictor_bias for t in token_lists], np.float32)

        encoder_out, encoder_out_lens = self.encode(
            params, jnp.asarray(speech), jnp.asarray(speech_lengths))
        mask = make_pad_mask(encoder_out_lens, encoder_out.shape[1])
        _, _, us_alphas, us_peaks = self.predictor.get_upsample_timestamp(
            params["predictor"], encoder_out, mask, token_num=jnp.asarray(token_nums))
        us_alphas, us_peaks = np.asarray(us_alphas), np.asarray(us_peaks)
        enc_lens = np.asarray(encoder_out_lens)
        up = self.predictor.upsample_times

        results = []
        if key is None:
            key = [f"rand_key_{i}" for i in range(len(token_lists))]
        for i, ids in enumerate(token_lists):
            token = tokenizer.ids2tokens(ids)
            n_us = int(enc_lens[i]) * up
            ts_str, timestamp = ts_prediction_lfr6_standard(
                us_alphas[i, :n_us], us_peaks[i, :n_us], list(token),
                vad_offset=kwargs.get("begin_time", 0), upsample_rate=up)
            text_post, timestamp, _ = postprocess_utils.sentence_postprocess(
                token, timestamp)
            results.append({"key": key[i], "text": text_post,
                            "timestamp": timestamp, "timestamp_str": ts_str})
        return results, meta
