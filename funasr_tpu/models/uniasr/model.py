"""UniASR: unified 2-pass streaming ASR (low-latency pass 1 + high-accuracy pass 2).

TPU-native rebuild of FunASR ``funasr/models/uniasr/model.py:26`` (+ SCAMA masks from
``funasr/models/scama``): pass 1 = chunked SANM encoder -> CIF -> SANM decoder
(streaming partials); pass 2 = a second encoder over [pass-1 encoder states || strided
features] -> CIF2 -> decoder2 (accurate finals). Both passes share the functional
Paraformer machinery; pass selection at inference mirrors the reference
``decoding_model`` switch (normal / fast / offline).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import funasr_tpu.models.scama.encoder  # noqa: F401
from funasr_tpu.core.layers import conv1d_apply, conv1d_init, make_pad_mask
from funasr_tpu.models.paraformer.model import Paraformer, add_sos_eos_out
from funasr_tpu.losses.label_smoothing_loss import label_smoothing_loss
from funasr_tpu.models.paraformer.cif_predictor import mae_token_loss
from funasr_tpu.register import tables
from funasr_tpu.utils import postprocess_utils


@tables.register("model_classes", "UniASR")
@tables.register("model_classes", "SCAMA")
class UniASR:
    def __init__(self, specaug=None, specaug_conf=None, normalize=None,
                 normalize_conf=None,
                 encoder: str = "SANMEncoderChunkOpt", encoder_conf=None,
                 encoder2: str = "SANMEncoder", encoder2_conf=None,
                 decoder: str = "ParaformerSANMDecoder", decoder_conf=None,
                 decoder2: str = "ParaformerSANMDecoder", decoder2_conf=None,
                 predictor: str = "CifPredictorV2", predictor_conf=None,
                 predictor2: str = "CifPredictorV2", predictor2_conf=None,
                 stride_conv=None, stride_conv_conf=None,
                 input_size: int = 560, vocab_size: int = -1, ignore_id: int = -1,
                 blank_id: int = 0, sos: int = 1, eos: int = 2,
                 lsm_weight: float = 0.0, predictor_weight: float = 1.0,
                 predictor_bias: int = 0, predictor2_bias: int = 0,
                 length_normalized_loss: bool = False, **kwargs):
        self.encoder = tables.encoder_classes[encoder](input_size=input_size,
                                                       **(encoder_conf or {}))
        enc1_out = self.encoder.output_size()
        self.decoder = tables.decoder_classes[decoder](
            vocab_size=vocab_size, encoder_output_size=enc1_out,
            **(decoder_conf or {}))
        self.predictor = tables.predictor_classes[predictor](**(predictor_conf or {}))
        # SCAMA configs carry one predictor section; the 2nd-pass predictor
        # defaults to the same conf (reference scama/template.yaml:46-52)
        if predictor2_conf is None:
            predictor2_conf = predictor_conf

        # pass-2 front: stride conv over [enc1_out || features]
        sc_conf = dict(stride_conv_conf or {})
        self.stride = sc_conf.get("stride", 2)
        stride_in = enc1_out + input_size
        self.stride_out = sc_conf.get("odim", enc1_out)
        self._stride_in = stride_in
        enc2_in = self.stride_out
        self.encoder2 = tables.encoder_classes[encoder2](
            input_size=enc2_in, **(encoder2_conf or {}))
        enc2_out = self.encoder2.output_size()
        self.decoder2 = tables.decoder_classes[decoder2](
            vocab_size=vocab_size, encoder_output_size=enc2_out,
            **(decoder2_conf or {}))
        self.predictor2 = tables.predictor_classes[predictor2](
            **(predictor2_conf or {}))

        self.specaug = (tables.specaug_classes[specaug](**(specaug_conf or {}))
                        if specaug else None)
        self.vocab_size = vocab_size
        self.ignore_id = ignore_id
        self.blank_id = blank_id
        self.sos = sos
        self.eos = eos
        self.lsm_weight = lsm_weight
        self.predictor_weight = predictor_weight
        self.predictor_bias = predictor_bias
        self.predictor2_bias = predictor2_bias
        self.length_normalized_loss = length_normalized_loss

    def init_params(self, rng):
        keys = jax.random.split(rng, 7)
        return {
            "encoder": self.encoder.init(keys[0]),
            "decoder": self.decoder.init(keys[1]),
            "predictor": self.predictor.init(keys[2]),
            "stride_conv": conv1d_init(keys[3], self._stride_in, self.stride_out, 3),
            "encoder2": self.encoder2.init(keys[4]),
            "decoder2": self.decoder2.init(keys[5]),
            "predictor2": self.predictor2.init(keys[6]),
        }

    # ------------------------------------------------------------------

    def _pass1(self, params, speech, speech_lengths, rng=None):
        if self.specaug is not None and rng is not None:
            speech, speech_lengths = self.specaug(speech, speech_lengths, rng)
        enc1, enc1_lens = self.encoder(params["encoder"], speech, speech_lengths,
                                       rng=rng)
        return enc1, enc1_lens

    def _pass2_encode(self, params, enc1, speech, lengths):
        fused = jnp.concatenate([enc1, speech.astype(enc1.dtype)], axis=-1)
        strided = conv1d_apply(params["stride_conv"], fused, left_pad=1,
                               right_pad=1, stride=self.stride)
        lens2 = -(-lengths // self.stride)
        return self.encoder2(params["encoder2"], strided, lens2)

    def _pass_loss(self, params, enc, enc_lens, text, text_lengths, which: str,
                   bias: int):
        predictor = self.predictor if which == "1" else self.predictor2
        decoder = self.decoder if which == "1" else self.decoder2
        p_pred = params["predictor" if which == "1" else "predictor2"]
        p_dec = params["decoder" if which == "1" else "decoder2"]
        ys, ys_lens = text, text_lengths
        if bias == 1:
            ys = add_sos_eos_out(text, text_lengths, self.eos, self.ignore_id)
            ys_lens = text_lengths + 1
        mask = make_pad_mask(enc_lens, enc.shape[1])
        embeds, tok_num, _, _ = predictor(p_pred, enc, mask, ys.shape[1],
                                          target_length=ys_lens)
        logits, _ = decoder(p_dec, enc, enc_lens, embeds, ys_lens)
        loss_att = label_smoothing_loss(logits, ys, self.ignore_id, self.lsm_weight,
                                        self.vocab_size,
                                        self.length_normalized_loss)
        loss_pre = mae_token_loss(ys_lens, tok_num)
        return loss_att + loss_pre * self.predictor_weight, loss_att, loss_pre

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths, rng):
        enc1, enc1_lens = self._pass1(params, speech, speech_lengths, rng)
        loss1, att1, pre1 = self._pass_loss(params, enc1, enc1_lens, text,
                                            text_lengths, "1", self.predictor_bias)
        enc2, enc2_lens = self._pass2_encode(params, enc1, speech, enc1_lens)
        loss2, att2, pre2 = self._pass_loss(params, enc2, enc2_lens, text,
                                            text_lengths, "2", self.predictor2_bias)
        loss = loss1 + loss2
        stats = {"loss": loss, "loss_att1": att1, "loss_att2": att2,
                 "loss_pre1": pre1, "loss_pre2": pre2}
        return loss, stats, speech.shape[0]

    # ------------------------------------------------------------------

    def _decode_pass(self, params, enc, enc_lens, which: str):
        predictor = self.predictor if which == "1" else self.predictor2
        decoder = self.decoder if which == "1" else self.decoder2
        p_pred = params["predictor" if which == "1" else "predictor2"]
        p_dec = params["decoder" if which == "1" else "decoder2"]
        mask = make_pad_mask(enc_lens, enc.shape[1])
        k = enc.shape[1] + 1
        embeds, tok_num, _, _ = predictor(p_pred, enc, mask, k)
        tok_lens = jnp.clip(jnp.round(tok_num).astype(jnp.int32), 0, k)
        logits, _ = decoder(p_dec, enc, enc_lens, embeds, tok_lens)
        yseq = jnp.argmax(jax.nn.log_softmax(logits.astype(jnp.float32), -1), -1)
        valid = make_pad_mask(tok_lens, k)
        return np.asarray(jnp.where(valid, yseq, self.blank_id)), np.asarray(tok_lens)

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)

        meta: Dict = {}
        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs, audio_fs=kwargs.get("fs", 16000))
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)
        meta["batch_data_time"] = (float(np.sum(speech_lengths))
                                   * frontend.frame_shift_ms * frontend.lfr_n / 1000)
        speech = jnp.asarray(speech)
        speech_lengths = jnp.asarray(speech_lengths)

        mode = kwargs.get("decoding_model", "normal")  # fast=pass1, normal/offline=2
        enc1, enc1_lens = self._pass1(params, speech, speech_lengths)
        if mode == "fast":
            yseq, tok_lens = self._decode_pass(params, enc1, enc1_lens, "1")
        else:
            enc2, enc2_lens = self._pass2_encode(params, enc1, speech, enc1_lens)
            yseq, tok_lens = self._decode_pass(params, enc2, enc2_lens, "2")

        if key is None:
            key = [f"rand_key_{i}" for i in range(yseq.shape[0])]
        results = []
        for i in range(yseq.shape[0]):
            token_int = [int(t) for t in yseq[i, : tok_lens[i]]
                         if t not in (self.blank_id, self.sos, self.eos)]
            if tokenizer is not None:
                token = tokenizer.ids2tokens(token_int)
                text, _ = postprocess_utils.sentence_postprocess(token)
                results.append({"key": key[i], "text": text})
            else:
                results.append({"key": key[i], "token_int": token_int})
        return results, meta
