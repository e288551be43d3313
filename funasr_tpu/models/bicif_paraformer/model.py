"""BiCifParaformer: Paraformer + second CIF pass for per-token timestamps
(arXiv 2301.12343). Production zh model ``speech_paraformer-large-vad-punc...``.

Rebuild of FunASR ``funasr/models/bicif_paraformer/model.py:42-360``: inference runs
the normal Paraformer decode, then ``calc_predictor_timestamp`` (CifPredictorV3
upsample head) feeds ``ts_prediction_lfr6_standard`` (upsample_rate=3).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import funasr_tpu.models.bicif_paraformer.cif_predictor  # noqa: F401 (registers V3)
from funasr_tpu.core.layers import make_pad_mask
from funasr_tpu.models.paraformer.cif_predictor import mae_token_loss
from funasr_tpu.models.paraformer.model import Paraformer
from funasr_tpu.register import tables
from funasr_tpu.utils import postprocess_utils
from funasr_tpu.utils.timestamp_tools import ts_prediction_lfr6_standard


@partial(jax.jit, static_argnames=("self", "max_tokens"))
def _infer_ts_program(self, params, speech, speech_lengths, max_tokens):
    """Jit cache for the decode+timestamp program (one compile per bucket)."""
    return self.infer_jit_timestamp(params, speech, speech_lengths, max_tokens)


@tables.register("model_classes", "BiCifParaformer")
class BiCifParaformer(Paraformer):
    def __init__(self, *args, predictor: str = "CifPredictorV3", **kwargs):
        super().__init__(*args, predictor=predictor, **kwargs)

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths, rng):
        loss, stats, weight = super().forward_jit(params, speech, speech_lengths,
                                                  text, text_lengths, rng)
        # second predictor head loss (reference _calc_pre2_loss)
        encoder_out, encoder_out_lens = self.encode(params, speech, speech_lengths)
        mask = make_pad_mask(encoder_out_lens, encoder_out.shape[1])
        _, _, us_alphas, _ = self.predictor.get_upsample_timestamp(
            params["predictor"], encoder_out, mask)
        token_num2 = jnp.sum(us_alphas, axis=-1)
        loss_pre2 = mae_token_loss(text_lengths + self.predictor_bias, token_num2)
        loss = loss + loss_pre2
        stats = dict(stats)
        stats["loss_pre2"] = loss_pre2
        stats["loss"] = loss
        return loss, stats, weight

    def infer_jit_timestamp(self, params, speech, speech_lengths,
                            max_tokens: Optional[int] = None):
        (yseq, token_lens, score, alphas, peaks,
         encoder_out, encoder_out_lens) = self.infer_core(
            params, speech, speech_lengths, max_tokens)
        mask = make_pad_mask(encoder_out_lens, encoder_out.shape[1])
        _, _, us_alphas, us_peaks = self.predictor.get_upsample_timestamp(
            params["predictor"], encoder_out, mask,
            token_num=token_lens.astype(jnp.float32))
        return yseq, token_lens, score, us_alphas, us_peaks, encoder_out_lens

    def infer_timestamp_bucketed(self, params, speech, speech_lengths):
        """Bucketed + jit-cached timestamp decode (public-path counterpart of
        ``Paraformer.infer_bucketed``), with the same saturation fallback."""
        from funasr_tpu.utils.bucket import pad_feats_bucketed

        sp, ln, b = pad_feats_bucketed(speech, speech_lengths)
        mt = self._max_tokens_for(sp.shape[1])
        out = _infer_ts_program(self, params, sp, ln, mt)
        token_lens = np.asarray(out[1])
        if mt <= sp.shape[1] and (token_lens[:b] >= mt).any():
            out = _infer_ts_program(self, params, sp, ln, sp.shape[1] + 1)
        return tuple(np.asarray(x)[:b] for x in out)

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)

        meta: Dict = {}
        t0 = time.perf_counter()
        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs, audio_fs=kwargs.get("fs", 16000),
            data_type=kwargs.get("data_type", "sound"))
        meta["load_data"] = f"{time.perf_counter() - t0:0.3f}"
        t1 = time.perf_counter()
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend,
                                               device=True)
        meta["extract_feat"] = f"{time.perf_counter() - t1:0.3f}"
        meta["batch_data_time"] = (float(np.sum(speech_lengths))
                                   * frontend.frame_shift_ms * frontend.lfr_n / 1000)

        yseq, token_lens, score, us_alphas, us_peaks, enc_lens = \
            self.infer_timestamp_bucketed(params, speech, speech_lengths)
        up = self.predictor.upsample_times

        results = []
        b = yseq.shape[0]
        if key is None:
            key = [f"rand_key_{i}" for i in range(b)]
        for i in range(b):
            token_int = [int(t) for t in yseq[i, : token_lens[i]]
                         if t not in (self.blank_id, self.sos, self.eos)]
            if tokenizer is None:
                results.append({"key": key[i], "token_int": token_int})
                continue
            token = tokenizer.ids2tokens(token_int)
            n_us = int(enc_lens[i]) * up
            _, timestamp = ts_prediction_lfr6_standard(
                us_alphas[i, :n_us], us_peaks[i, :n_us], list(token),
                vad_offset=kwargs.get("begin_time", 0), upsample_rate=up)
            if not hasattr(tokenizer, "bpemodel"):
                text, timestamp, _ = postprocess_utils.sentence_postprocess(
                    token, timestamp)
            else:
                text = tokenizer.tokens2text(token)
            results.append({"key": key[i], "text": text, "timestamp": timestamp})
        return results, meta
