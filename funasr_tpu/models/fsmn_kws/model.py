"""FSMN keyword spotting (wake word detection).

TPU-native rebuild of FunASR ``funasr/models/fsmn_kws/model.py:27`` (+ decode helpers
``funasr/utils/kws_utils.py``): FSMN encoder + CTC head; detection scores each
keyword's CTC forced-alignment log-likelihood against the blank-path baseline.
"""

from __future__ import annotations

import math
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import funasr_tpu.models.fsmn_vad_streaming.encoder  # noqa: F401 (registers FSMN)
from funasr_tpu.models.ctc.ctc import CTC
from funasr_tpu.ops.ctc_align import ctc_forced_align
from funasr_tpu.register import tables


@tables.register("model_classes", "FsmnKWS")
@tables.register("model_classes", "SanmKWS")
class FsmnKWS:
    def __init__(self, specaug: Optional[str] = None, specaug_conf: Optional[Dict] = None,
                 normalize: Optional[str] = None, normalize_conf: Optional[Dict] = None,
                 encoder: str = "FSMN", encoder_conf: Optional[Dict] = None,
                 ctc: str = "CTC", ctc_conf: Optional[Dict] = None,
                 ctc_weight: float = 1.0, input_size: int = 360,
                 vocab_size: int = -1, ignore_id: int = -1, blank_id: int = 0,
                 **kwargs):
        enc_conf = dict(encoder_conf or {})
        if encoder == "FSMN":
            enc_conf.setdefault("input_dim", input_size)
            enc_conf.setdefault("use_softmax", False)
            enc_conf.setdefault("output_dim", vocab_size if vocab_size > 0
                                else enc_conf.get("output_dim", 128))
            self.encoder = tables.encoder_classes[encoder](**enc_conf)
            enc_out = self.encoder.output_size()
            self.encoder_is_logits = enc_out == vocab_size and vocab_size > 0
        else:
            self.encoder = tables.encoder_classes[encoder](input_size=input_size,
                                                           **enc_conf)
            enc_out = self.encoder.output_size()
            self.encoder_is_logits = False
        self.ctc = None
        if not self.encoder_is_logits:
            self.ctc = CTC(odim=vocab_size, encoder_output_size=enc_out,
                           **(ctc_conf or {}))
        self.specaug = (tables.specaug_classes[specaug](**(specaug_conf or {}))
                        if specaug else None)
        self.vocab_size = vocab_size
        self.blank_id = blank_id
        self.ignore_id = ignore_id

    def init_params(self, rng):
        k1, k2 = jax.random.split(rng)
        p = {"encoder": self.encoder.init(k1)}
        if self.ctc is not None:
            p["ctc"] = self.ctc.init(k2)
        return p

    def _logits(self, params, speech, speech_lengths, rng=None):
        if self.specaug is not None and rng is not None:
            speech, speech_lengths = self.specaug(speech, speech_lengths, rng)
        if hasattr(self.encoder, "cfg") and hasattr(self.encoder.cfg, "fsmn_layers"):
            enc = self.encoder(params["encoder"], speech)
            enc_lens = speech_lengths
        else:
            enc, enc_lens = self.encoder(params["encoder"], speech, speech_lengths,
                                         rng=rng)
        if self.ctc is not None:
            return self.ctc.logits(params["ctc"], enc), enc_lens
        return enc, enc_lens

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths, rng):
        logits, enc_lens = self._logits(params, speech, speech_lengths, rng)
        import optax
        logp = logits.astype(jnp.float32)
        t = logp.shape[1]
        logit_pad = (jnp.arange(t)[None] >= enc_lens[:, None]).astype(jnp.float32)
        l = text.shape[1]
        label_pad = (jnp.arange(l)[None] >= text_lengths[:, None]).astype(jnp.float32)
        labels = jnp.where(label_pad > 0, 0, text)
        loss = jnp.mean(optax.ctc_loss(logp, logit_pad, labels, label_pad,
                                       blank_id=self.blank_id))
        return loss, {"loss": loss}, speech.shape[0]

    # ------------------------------------------------------------------

    def detect(self, params, speech, speech_lengths, keyword_token_lists,
               threshold: float = -5.0):
        """Score each keyword per utterance: normalized forced-align advantage
        over the all-blank path. Returns [{keyword_idx, score, detected}...] per utt."""
        logits, enc_lens = self._logits(params, jnp.asarray(speech),
                                        jnp.asarray(speech_lengths))
        logp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), -1))
        enc_lens = np.asarray(enc_lens)
        out = []
        for i in range(logp.shape[0]):
            t = int(enc_lens[i])
            lp = logp[i, :t]
            blank_ll = float(lp[:, self.blank_id].sum())
            utt = []
            for ki, toks in enumerate(keyword_token_lists):
                toks_arr = np.asarray(toks, np.int64)
                path = ctc_forced_align(lp, toks_arr, t, len(toks_arr),
                                        self.blank_id)
                ll = float(lp[np.arange(t), path].sum())
                score = (ll - blank_ll) / max(len(toks_arr), 1)
                utt.append({"keyword_idx": ki, "score": score,
                            "detected": score > threshold})
            out.append(utt)
        return out

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)

        meta: Dict = {}
        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs, audio_fs=kwargs.get("fs", 16000))
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)

        keywords = kwargs.get("keywords") or kwargs.get("keyword") or ""
        if isinstance(keywords, (list, tuple)):
            keywords = ",".join(keywords)
        if key is None:
            key = [f"rand_key_{i}" for i in range(speech.shape[0])]
        if not keywords or tokenizer is None:
            return [{"key": k, "value": []} for k in key], meta
        kw_list = [k for k in keywords.replace(" ", ",").split(",") if k]

        if kwargs.get("decode_mode", "forced_align") == "prefix_beam":
            # reference decode path: CTC prefix-beam keyword detector
            # (KwsCtcPrefixDecoder, funasr/utils/kws_utils.py:90-308) —
            # first-hit keyword with sqrt-compressed confidence + frame span
            from funasr_tpu.utils.kws_utils import KwsCtcPrefixDecoder
            decoder = KwsCtcPrefixDecoder(
                keywords=",".join(kw_list),
                token_list=list(getattr(tokenizer, "token_list", [])),
                seg_dict=kwargs.get("seg_dict"), blank_id=self.blank_id)
            logits, enc_lens = self._logits(params, jnp.asarray(speech),
                                            jnp.asarray(speech_lengths))
            probs = np.asarray(jax.nn.softmax(logits.astype(jnp.float32), -1))
            enc_lens = np.asarray(enc_lens)
            results = []
            for i in range(probs.shape[0]):
                ok, word, score, span = decoder.decode(
                    probs[i, : int(enc_lens[i])])
                hits = [{"keyword": word, "score": round(score, 4),
                         "frames": span}] if ok else []
                results.append({"key": key[i], "value": hits})
            return results, meta

        # forced-align advantage scoring over every keyword (thresholded)
        kw_tokens = [tokenizer.encode(k) for k in kw_list]
        detections = self.detect(params, speech, speech_lengths, kw_tokens,
                                 threshold=kwargs.get("kws_threshold", -5.0)) \
            if kw_tokens else [[] for _ in range(speech.shape[0])]
        results = []
        for i, dets in enumerate(detections):
            hits = [{"keyword": kw_list[d["keyword_idx"]],
                     "score": round(d["score"], 4)}
                    for d in dets if d["detected"]]
            results.append({"key": key[i], "value": hits})
        return results, meta


@tables.register("model_classes", "FsmnKWSConvert")
@tables.register("model_classes", "FsmnKWSMT")
@tables.register("model_classes", "FsmnKWSMTConvert")
@tables.register("model_classes", "SanmKWSStreaming")
class FsmnKWSStreaming(FsmnKWS):
    """Streaming / multi-task KWS variants (reference ``fsmn_kws_mt/``,
    ``sanm_kws_streaming/``): chunked scoring with carried FSMN caches; detection
    runs over a sliding window of recent frames."""

    def __init__(self, *args, window_frames: int = 200, **kwargs):
        super().__init__(*args, **kwargs)
        self.window_frames = window_frames

    def init_cache(self):
        return {"encoder": {}, "logp_window": None}

    def detect_chunk(self, params, feats, cache, keyword_token_lists,
                     threshold: float = -5.0):
        """Feed one feature chunk; returns detections over the rolling window."""
        if hasattr(self.encoder, "cfg") and hasattr(self.encoder.cfg, "fsmn_layers"):
            enc = self.encoder(params["encoder"], jnp.asarray(feats),
                               cache=cache["encoder"])
        else:
            enc, _ = self.encoder(params["encoder"], jnp.asarray(feats),
                                  jnp.asarray([feats.shape[1]]))
        logits = self.ctc.logits(params["ctc"], enc) if self.ctc is not None else enc
        logp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), -1))[0]
        win = logp if cache["logp_window"] is None else \
            np.concatenate([cache["logp_window"], logp])[-self.window_frames:]
        cache["logp_window"] = win
        out = []
        blank_ll = float(win[:, self.blank_id].sum())
        for ki, toks in enumerate(keyword_token_lists):
            toks_arr = np.asarray(toks, np.int64)
            if len(win) < len(toks_arr) * 2 + 1:
                continue
            path = ctc_forced_align(win, toks_arr, len(win), len(toks_arr),
                                    self.blank_id)
            ll = float(win[np.arange(len(win)), path].sum())
            score = (ll - blank_ll) / max(len(toks_arr), 1)
            if score > threshold:
                out.append({"keyword_idx": ki, "score": score})
        return out
