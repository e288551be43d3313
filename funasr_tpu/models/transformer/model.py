"""Transformer AED: hybrid CTC-attention ASR (base of Conformer/Branchformer).

TPU-native rebuild of FunASR ``funasr/models/transformer/model.py:23+``: training
loss = ctc_weight*CTC + (1-ctc_weight)*label-smoothed CE with sos/eos teacher
forcing; inference = attention beam search (CTC joint scoring arrives with the
full scorer set).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import make_pad_mask
from funasr_tpu.losses.label_smoothing_loss import label_smoothing_loss, th_accuracy
from funasr_tpu.models.ctc.ctc import CTC
from funasr_tpu.models.transformer.search import beam_search
from funasr_tpu.register import tables
from funasr_tpu.utils import postprocess_utils


def add_sos_eos(ys_pad, ys_lens, sos: int, eos: int, ignore_id: int = -1):
    """-> (ys_in (B, L+1) starting with sos, ys_out (B, L+1) ending with eos)."""
    b, l = ys_pad.shape
    valid = make_pad_mask(ys_lens, l)
    ys_clean = jnp.where(valid, ys_pad, 0)
    ys_in = jnp.concatenate([jnp.full((b, 1), sos, ys_pad.dtype), ys_clean], axis=1)
    ys_out = jnp.full((b, l + 1), ignore_id, ys_pad.dtype)
    ys_out = ys_out.at[:, :l].set(jnp.where(valid, ys_pad, ignore_id))
    ys_out = ys_out.at[jnp.arange(b), ys_lens].set(eos)
    return ys_in, ys_out


@tables.register("model_classes", "Transformer")
class Transformer:
    def __init__(self, specaug=None, specaug_conf=None, normalize=None,
                 normalize_conf=None, encoder: str = "TransformerEncoder",
                 encoder_conf=None, decoder: str = "TransformerDecoder",
                 decoder_conf=None, ctc: str = "CTC", ctc_conf=None,
                 ctc_weight: float = 0.5, input_size: int = 80, vocab_size: int = -1,
                 ignore_id: int = -1, blank_id: int = 0, sos: int = 1, eos: int = 2,
                 lsm_weight: float = 0.0, length_normalized_loss: bool = False,
                 **kwargs):
        self.encoder = tables.encoder_classes[encoder](input_size=input_size,
                                                       **(encoder_conf or {}))
        enc_out = self.encoder.output_size()
        self.decoder = tables.decoder_classes[decoder](
            vocab_size=vocab_size, encoder_output_size=enc_out,
            **(decoder_conf or {}))
        self.ctc = CTC(odim=vocab_size, encoder_output_size=enc_out,
                       **(ctc_conf or {})) if ctc_weight > 0 else None
        self.specaug = (tables.specaug_classes[specaug](**(specaug_conf or {}))
                        if specaug else None)
        self.normalize = (tables.normalize_classes[normalize](**(normalize_conf or {}))
                          if normalize else None)
        self.vocab_size = vocab_size
        self.ignore_id = ignore_id
        self.blank_id = blank_id
        self.sos = sos
        self.eos = eos
        self.ctc_weight = ctc_weight
        self.lsm_weight = lsm_weight
        self.length_normalized_loss = length_normalized_loss

    def init_params(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        p = {"encoder": self.encoder.init(k1), "decoder": self.decoder.init(k2)}
        if self.ctc is not None:
            p["ctc"] = self.ctc.init(k3)
        return p

    def encode(self, params, speech, speech_lengths, rng=None):
        if self.specaug is not None and rng is not None:
            speech, speech_lengths = self.specaug(speech, speech_lengths, rng)
        if self.normalize is not None:
            speech, speech_lengths = self.normalize(speech, speech_lengths)
        return self.encoder(params["encoder"], speech, speech_lengths, rng=rng)

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths, rng):
        encoder_out, encoder_out_lens = self.encode(params, speech, speech_lengths,
                                                    rng=rng)
        stats: Dict = {}
        loss_ctc = 0.0
        if self.ctc is not None:
            loss_ctc = self.ctc.loss(params["ctc"], encoder_out, encoder_out_lens,
                                     text, text_lengths)
            stats["loss_ctc"] = loss_ctc
        ys_in, ys_out = add_sos_eos(text, text_lengths, self.sos, self.eos,
                                    self.ignore_id)
        logits, _ = self.decoder(params["decoder"], encoder_out, encoder_out_lens,
                                 ys_in, text_lengths + 1)
        loss_att = label_smoothing_loss(logits, ys_out, self.ignore_id,
                                        self.lsm_weight, self.vocab_size,
                                        self.length_normalized_loss)
        stats["acc"] = th_accuracy(logits, ys_out, self.ignore_id)
        if self.ctc is not None:
            loss = self.ctc_weight * loss_ctc + (1 - self.ctc_weight) * loss_att
        else:
            loss = loss_att
        stats.update(loss_att=loss_att, loss=loss)
        return loss, stats, speech.shape[0]

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
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)
        meta["batch_data_time"] = (float(np.sum(speech_lengths))
                                   * frontend.frame_shift_ms
                                   * getattr(frontend, "lfr_n", 1) / 1000)

        encoder_out, encoder_out_lens = self.encode(
            params, jnp.asarray(speech), jnp.asarray(speech_lengths))
        hotword_scorer = None
        if kwargs.get("hotword") and tokenizer is not None:
            from funasr_tpu.models.transformer.hotword_scorer import \
                build_hotword_scorer
            hotword_scorer = build_hotword_scorer(
                kwargs["hotword"], tokenizer,
                weight=kwargs.get("hotword_weight", 3.0))
        results = []
        b = encoder_out.shape[0]
        if key is None:
            key = [f"rand_key_{i}" for i in range(b)]
        for i in range(b):
            mem = encoder_out[i: i + 1]
            mmask = make_pad_mask(encoder_out_lens[i: i + 1], mem.shape[1])
            hyps = beam_search(self.decoder, params["decoder"], mem, mmask,
                               self.sos, self.eos,
                               beam_size=kwargs.get("beam_size", 10),
                               maxlenratio=kwargs.get("maxlenratio", 0.0),
                               minlenratio=kwargs.get("minlenratio", 0.0),
                               lm=kwargs.get("lm"),
                               lm_params=kwargs.get("lm_params"),
                               lm_weight=kwargs.get("lm_weight", 0.3),
                               hotword_scorer=hotword_scorer)
            best = hyps[0]
            token_int = [t for t in best.yseq[1:-1]
                         if t not in (self.sos, self.eos, self.blank_id)]
            if tokenizer is not None:
                token = tokenizer.ids2tokens(token_int)
                text, _ = postprocess_utils.sentence_postprocess(token)
                results.append({"key": key[i], "text": text})
            else:
                results.append({"key": key[i], "token_int": token_int})
        return results, meta


import funasr_tpu.models.transformer.encoder  # noqa: F401,E402 (registers)
import funasr_tpu.models.transformer.decoder  # noqa: F401,E402 (registers)


@tables.register("model_classes", "SANM")
class SANM(Transformer):
    """SAN-M CTC/attention AED (reference ``funasr/models/sanm/model.py:14`` —
    a Transformer whose encoder/decoder default to the SANM family)."""

    def __init__(self, encoder: str = "SANMEncoder", **kwargs):
        super().__init__(encoder=encoder, **kwargs)
