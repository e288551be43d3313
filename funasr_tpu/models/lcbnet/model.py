"""LCB-Net: long-context biasing AED ASR (audio-visual slides/OCR context).

TPU-native rebuild of FunASR ``funasr/models/lcbnet/model.py:28`` — a conformer
AED+CTC backbone plus the long-context biasing stack: OCR token ids run through
``TransformerTextEncoder``, a ``FusionSANEncoder`` (self+src attention block)
attends the audio encoding over the text memory, and the fused output is ADDED
to the encoder output before beam search (reference ``inference:517-533``:
``encoder_out = encoder_out + fusion_out``). The ``ConvBiasPredictor`` scores
per-text-token presence (kept for the bias-training objective). Training loss
is the standard CTC+attention mix (reference ``forward:208-300`` does not
touch the bias stack).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import funasr_tpu.models.lcbnet.encoder  # noqa: F401 (registers aux encoders)
from funasr_tpu.models.transformer.model import Transformer
from funasr_tpu.register import tables


@tables.register("model_classes", "LCBNet")
class LCBNet(Transformer):
    """Output: {"key", "text"} — beam-searched transcript, biased toward the
    ``ocr_text`` context when provided."""

    def __init__(self, encoder: str = "ConformerEncoder", encoder_conf=None,
                 text_encoder: str = "TransformerTextEncoder",
                 text_encoder_conf=None,
                 fusion_encoder: str = "FusionSANEncoder",
                 fusion_encoder_conf=None,
                 bias_predictor: str = "ConvBiasPredictor",
                 bias_predictor_conf=None,
                 select_num: int = 2, select_length: int = 3,
                 insert_blank: bool = True, **kwargs):
        super().__init__(encoder=encoder, encoder_conf=encoder_conf, **kwargs)
        enc_out = self.encoder.output_size()
        tconf = dict(text_encoder_conf or {})
        tconf.setdefault("output_size", enc_out)
        self.text_encoder = tables.encoder_classes[text_encoder](
            vocab_size=self.vocab_size, **tconf)
        fconf = dict(fusion_encoder_conf or {})
        fconf.setdefault("size", enc_out)
        fconf.setdefault("attention_dim", enc_out)
        self.fusion_encoder = tables.encoder_classes[fusion_encoder](**fconf)
        bconf = dict(bias_predictor_conf or {})
        bconf.setdefault("size", enc_out)
        self.bias_predictor = tables.encoder_classes[bias_predictor](**bconf)
        self.select_num = select_num
        self.select_length = select_length
        self.insert_blank = insert_blank

    def init_params(self, rng):
        params = super().init_params(rng)
        k1, k2, k3 = jax.random.split(jax.random.fold_in(rng, 77), 3)
        params["text_encoder"] = self.text_encoder.init(k1)
        params["fusion_encoder"] = self.fusion_encoder.init(k2)
        params["bias_predictor"] = self.bias_predictor.init(k3)
        return params

    # ------------------------------------------------------------------

    def fuse_ocr(self, params, encoder_out, ocr_ids, ocr_lengths=None):
        """encoder_out (B, T, D) + SelfSrcAttention(enc, text_enc)
        (reference ``inference:525-527``)."""
        if ocr_lengths is None:
            ocr_lengths = jnp.full((ocr_ids.shape[0],), ocr_ids.shape[1],
                                   jnp.int32)
        ocr_enc, _ = self.text_encoder(params["text_encoder"], ocr_ids,
                                       ocr_lengths)
        fusion_out = self.fusion_encoder(params["fusion_encoder"], encoder_out,
                                         ocr_enc)
        return encoder_out + fusion_out

    def bias_scores(self, params, encoder_out, ocr_ids, ocr_lengths=None):
        """Per-OCR-token presence logits (ConvBiasPredictor)."""
        if ocr_lengths is None:
            ocr_lengths = jnp.full((ocr_ids.shape[0],), ocr_ids.shape[1],
                                   jnp.int32)
        ocr_enc, _ = self.text_encoder(params["text_encoder"], ocr_ids,
                                       ocr_lengths)
        return self.bias_predictor(params["bias_predictor"], ocr_enc,
                                   encoder_out)

    # ------------------------------------------------------------------

    def inference(self, params, data_in, data_lengths=None,
                  key: Optional[List] = None, tokenizer=None, frontend=None,
                  ocr_text=None, **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)
        from funasr_tpu.core.layers import make_pad_mask
        from funasr_tpu.models.transformer.search import beam_search
        from funasr_tpu.utils import postprocess_utils

        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs, audio_fs=kwargs.get("fs", 16000),
            data_type=kwargs.get("data_type", "sound"))
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)
        encoder_out, encoder_out_lens = self.encode(
            params, jnp.asarray(speech), jnp.asarray(speech_lengths))

        if ocr_text and tokenizer is not None:
            ids = tokenizer.encode(ocr_text) if isinstance(ocr_text, str) \
                else list(ocr_text)
            # reference inference:520 shifts non-blank ids by +1 when the
            # bias list was built with an inserted blank
            if self.insert_blank:
                ids = [x + 1 if x != 0 else x for x in ids]
            ocr_ids = jnp.tile(jnp.asarray([ids], jnp.int32),
                               (encoder_out.shape[0], 1))
            encoder_out = self.fuse_ocr(params, encoder_out, ocr_ids)

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
                               minlenratio=kwargs.get("minlenratio", 0.0))
            token_int = [t for t in hyps[0].yseq[1:-1]
                         if t not in (self.sos, self.eos, self.blank_id)]
            if tokenizer is not None:
                token = tokenizer.ids2tokens(token_int)
                text, _ = postprocess_utils.sentence_postprocess(token)
                results.append({"key": key[i], "text": text})
            else:
                results.append({"key": key[i], "token_int": token_int})
        return results, {}
