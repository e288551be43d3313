"""SenseVoiceSmall: non-autoregressive multilingual ASR + emotion/audio-event tags.

TPU-native rebuild of the reference (FunASR ``funasr/models/sense_voice/model.py``:
``SenseVoiceEncoderSmall:488-655`` — SAN-M stack + ``tp_encoders`` timestamp tail with
its own norm; ``SenseVoiceSmall:658-1120`` — 4 query-embedding prompt frames (language,
event, emotion, textnorm) prepended to fbank, CTC head over rich-tag vocab, training
loss = CTC on frames 4+ plus CE on the 4 prompt positions (``forward:767-815``);
greedy CTC decode ``:1013-1028`` with ``<|zh|><|HAPPY|>...`` tags).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import (
    add_sinusoidal_pe, embedding_apply, embedding_init, layer_norm_apply,
    layer_norm_init, make_pad_mask)
from funasr_tpu.core.module import stack_params
from funasr_tpu.losses.label_smoothing_loss import label_smoothing_loss, th_accuracy
from funasr_tpu.models.ctc.ctc import CTC
from funasr_tpu.models.sanm.encoder import SANMEncoderConfig, _layer_apply, _layer_init
from funasr_tpu.register import tables


@tables.register("encoder_classes", "SenseVoiceEncoderSmall")
class SenseVoiceEncoderSmall:
    def __init__(self, input_size: int, output_size: int = 512,
                 attention_heads: int = 4, linear_units: int = 2048,
                 num_blocks: int = 6, tp_blocks: int = 0, kernel_size: int = 11,
                 sanm_shfit: int = 0, **kwargs):
        self.cfg = SANMEncoderConfig(
            input_size=input_size, output_size=output_size,
            attention_heads=attention_heads, linear_units=linear_units,
            num_blocks=num_blocks, kernel_size=kernel_size, sanm_shift=sanm_shfit,
            input_layer="pe", dropout_rate=0.0)
        self.tp_blocks = tp_blocks

    def output_size(self) -> int:
        return self.cfg.output_size

    def init(self, rng):
        cfg = self.cfg
        keys = jax.random.split(rng, cfg.num_blocks + self.tp_blocks + 1)
        params = {
            "encoders0": _layer_init(keys[0], cfg, first=True),
            "after_norm": layer_norm_init(cfg.output_size),
            "tp_norm": layer_norm_init(cfg.output_size),
        }
        if cfg.num_blocks > 1:
            params["encoders"] = stack_params(
                [_layer_init(keys[1 + i], cfg, first=False)
                 for i in range(cfg.num_blocks - 1)])
        if self.tp_blocks > 0:
            params["tp_encoders"] = stack_params(
                [_layer_init(keys[cfg.num_blocks + i], cfg, first=False)
                 for i in range(self.tp_blocks)])
        return params

    def __call__(self, params, xs_pad, ilens, rng=None):
        cfg = self.cfg
        mask = make_pad_mask(ilens, xs_pad.shape[1])
        x = xs_pad * (cfg.output_size ** 0.5)
        x = add_sinusoidal_pe(x)
        x = _layer_apply(params["encoders0"], cfg, x, mask, first=True)

        def body(carry, lp):
            return _layer_apply(lp, cfg, carry, mask, first=False), None

        if "encoders" in params:
            x, _ = jax.lax.scan(body, x, params["encoders"])
        x = layer_norm_apply(params["after_norm"], x)
        if "tp_encoders" in params:
            x, _ = jax.lax.scan(body, x, params["tp_encoders"])
        x = layer_norm_apply(params["tp_norm"], x)
        return x, ilens


@partial(jax.jit, static_argnames=("self", "ban_emo_unk"))
def _sv_infer_program(self, params, speech, speech_lengths, lid_ids, tn_ids,
                      ban_emo_unk):
    """Jit cache for the public CTC decode path (one compile per (B,T) bucket);
    drops the full log-softmax output so only ids/lens ever leave the device."""
    yseq, out_lens, _ = self.infer_jit(params, speech, speech_lengths, lid_ids,
                                       tn_ids, ban_emo_unk=ban_emo_unk)
    return yseq, out_lens


@tables.register("model_classes", "SenseVoiceSmall")
class SenseVoiceSmall:
    LID_DICT = {"auto": 0, "zh": 3, "en": 4, "yue": 7, "ja": 11, "ko": 12,
                "nospeech": 13}
    LID_INT_DICT = {24884: 3, 24885: 4, 24888: 7, 24892: 11, 24896: 12, 24992: 13}
    TEXTNORM_DICT = {"withitn": 14, "woitn": 15}
    TEXTNORM_INT_DICT = {25016: 14, 25017: 15}
    EMO_UNK = 25009

    def __init__(self, specaug: Optional[str] = None, specaug_conf: Optional[dict] = None,
                 normalize: Optional[str] = None, normalize_conf: Optional[dict] = None,
                 encoder: str = "SenseVoiceEncoderSmall",
                 encoder_conf: Optional[dict] = None, ctc_conf: Optional[dict] = None,
                 input_size: int = 80, vocab_size: int = -1, ignore_id: int = -1,
                 blank_id: int = 0, sos: int = 1, eos: int = 2,
                 length_normalized_loss: bool = False, lsm_weight: float = 0.0,
                 **kwargs):
        self.encoder = tables.encoder_classes[encoder](
            input_size=input_size, **(encoder_conf or {}))
        enc_out = self.encoder.output_size()
        self.ctc = CTC(odim=vocab_size, encoder_output_size=enc_out,
                       **(ctc_conf or {}))
        self.specaug = (tables.specaug_classes[specaug](**(specaug_conf or {}))
                        if specaug else None)
        self.normalize = (tables.normalize_classes[normalize](**(normalize_conf or {}))
                          if normalize else None)
        self.input_size = input_size
        self.vocab_size = vocab_size
        self.ignore_id = ignore_id
        self.blank_id = blank_id
        self.sos = sos
        self.eos = eos
        self.lsm_weight = lsm_weight
        self.length_normalized_loss = length_normalized_loss

    def init_params(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "encoder": self.encoder.init(k1),
            "ctc": self.ctc.init(k2),
            "embed": embedding_init(k3, 7 + len(self.LID_DICT)
                                    + len(self.TEXTNORM_DICT), self.input_size),
        }

    # ------------------------------------------------------------------

    def _with_prompt(self, params, speech, speech_lengths, lid_ids, textnorm_ids):
        """Prepend [language | event | emo | textnorm] query frames.

        lid_ids/textnorm_ids: (B,) int ids into the query embedding table.
        """
        b = speech.shape[0]
        emb = lambda ids: embedding_apply(params["embed"], ids,
                                          dtype=speech.dtype)  # noqa: E731
        language_query = emb(lid_ids)[:, None, :]
        textnorm_query = emb(textnorm_ids)[:, None, :]
        event_emo = emb(jnp.asarray([1, 2]))[None].repeat(b, axis=0)
        speech = jnp.concatenate(
            [language_query, event_emo, textnorm_query, speech], axis=1)
        return speech, speech_lengths + 4

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths, rng):
        """Training loss (reference ``forward:767-815``): text[:, :4] are the rich-tag
        targets whose first/fourth columns double as the query ids."""
        if self.specaug is not None and rng is not None:
            speech, speech_lengths = self.specaug(speech, speech_lengths, rng)
        if self.normalize is not None:
            speech, speech_lengths = self.normalize(speech, speech_lengths)

        # map vocab-space tag ids to query-embedding ids (0 when unknown)
        lid = text[:, 0]
        lid_ids = jnp.zeros_like(lid)
        for tok, qid in self.LID_INT_DICT.items():
            lid_ids = jnp.where(lid == tok, qid, lid_ids)
        tn = text[:, 3]
        tn_ids = jnp.full_like(tn, self.TEXTNORM_DICT["woitn"])
        for tok, qid in self.TEXTNORM_INT_DICT.items():
            tn_ids = jnp.where(tn == tok, qid, tn_ids)

        speech, speech_lengths = self._with_prompt(params, speech, speech_lengths,
                                                   lid_ids, tn_ids)
        encoder_out, encoder_out_lens = self.encoder(params["encoder"], speech,
                                                     speech_lengths)
        loss_ctc = self.ctc.loss(params["ctc"], encoder_out[:, 4:],
                                 encoder_out_lens - 4, text[:, 4:],
                                 text_lengths - 4)
        rich_logits = self.ctc.logits(params["ctc"], encoder_out[:, :4])
        loss_rich = label_smoothing_loss(rich_logits, text[:, :4],
                                         ignore_id=self.ignore_id,
                                         smoothing=self.lsm_weight,
                                         vocab_size=self.vocab_size,
                                         normalize_length=self.length_normalized_loss)
        acc_rich = th_accuracy(rich_logits, text[:, :4], self.ignore_id)
        loss = loss_ctc + loss_rich
        stats = {"loss_ctc": loss_ctc, "loss_rich": loss_rich, "loss": loss,
                 "acc_rich": acc_rich}
        weight = speech.shape[0]
        return loss, stats, weight

    def infer_jit(self, params, speech, speech_lengths, lid_ids, tn_ids,
                  ban_emo_unk: bool = False):
        """Batched CTC argmax over padded frames -> (ids (B,T+4), lens (B,))."""
        if self.normalize is not None:
            speech, speech_lengths = self.normalize(speech, speech_lengths)
        speech, speech_lengths = self._with_prompt(params, speech, speech_lengths,
                                                   lid_ids, tn_ids)
        encoder_out, encoder_out_lens = self.encoder(params["encoder"], speech,
                                                     speech_lengths)
        logits = self.ctc.log_softmax(params["ctc"], encoder_out)
        if ban_emo_unk:
            logits = logits.at[:, :, self.EMO_UNK].set(-jnp.inf)
        yseq = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return yseq, encoder_out_lens, logits

    # ------------------------------------------------------------------

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

        b = speech.shape[0]
        language = kwargs.get("language", "auto") or "auto"
        lid = self.LID_DICT.get(language, 0)
        use_itn = kwargs.get("use_itn", False)
        textnorm = kwargs.get("text_norm") or ("withitn" if use_itn else "woitn")
        tn = self.TEXTNORM_DICT[textnorm]

        from funasr_tpu.utils.bucket import pad_feats_bucketed
        sp, ln, b_real = pad_feats_bucketed(speech, speech_lengths)
        yseq, out_lens = _sv_infer_program(
            self, params, sp, ln,
            jnp.full((sp.shape[0],), lid, jnp.int32),
            jnp.full((sp.shape[0],), tn, jnp.int32),
            kwargs.get("ban_emo_unk", False))
        yseq = np.asarray(yseq)[:b_real]
        out_lens = np.asarray(out_lens)[:b_real]

        if key is None:
            key = [f"rand_key_{i}" for i in range(b)]
        results = []
        for i in range(b):
            ids = yseq[i, : out_lens[i]]
            # collapse repeats then drop blanks (CTC greedy)
            keep = np.concatenate([[True], ids[1:] != ids[:-1]])
            token_int = [int(t) for t in ids[keep] if t != self.blank_id]
            text = tokenizer.decode(token_int) if tokenizer is not None else ""
            results.append({"key": key[i], "text": text})
        return results, meta
