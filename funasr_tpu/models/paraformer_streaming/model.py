"""ParaformerStreaming: chunked low-latency NAR ASR (600 ms default stride).

TPU-native rebuild of the reference (FunASR ``funasr/models/paraformer_streaming/
model.py:42-763``: ``init_cache:511`` — cache dict {encoder:{feats, start_idx, opt,
chunk_size, look_back}, decoder:{decode_fsmn, opt}, frontend, prev_samples};
``generate_chunk:552`` — chunked encoder -> chunked CIF with carry -> chunked decoder
-> greedy tokens for fired tokens only; ``inference:650`` — 600 ms stride loop
(chunk_size=[0,10,5] LFR frames = chunk_size[1]*960 samples), tail-chunk replay).

The streaming state is a dict of fixed-shape device arrays; chunk shapes are constant
per stream so each stage compiles once.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

import funasr_tpu.models.scama.encoder  # noqa: F401 (registers SANMEncoderChunkOpt)
from funasr_tpu.models.paraformer.model import Paraformer
from funasr_tpu.register import tables
from funasr_tpu.utils import postprocess_utils


@tables.register("model_classes", "ParaformerStreaming")
class ParaformerStreaming(Paraformer):
    def __init__(self, **kwargs):
        kwargs.setdefault("encoder", "SANMEncoderChunkOpt")
        super().__init__(**kwargs)
        self.kwargs_conf = kwargs

    # ------------------------------------------------------------------

    def init_cache(self, cache: Optional[Dict] = None, **kwargs) -> Dict:
        if cache is None:
            cache = {}
        chunk_size = kwargs.get("chunk_size", [0, 10, 5])
        enc_dim = self.encoder.cfg.output_size
        feats_dim = self.encoder.cfg.input_size
        cache["encoder"] = {
            "start_idx": 0,
            "cif_state": self.predictor.init_state(1, enc_dim),
            "chunk_size": chunk_size,
            "encoder_chunk_look_back": kwargs.get("encoder_chunk_look_back", 0),
            "last_chunk": False,
            "opt": None,
            "feats": jnp.zeros((1, chunk_size[0] + chunk_size[2], feats_dim),
                               jnp.float32),
            "tail_chunk": False,
        }
        cache["decoder"] = {
            "decode_fsmn": None,
            "decoder_chunk_look_back": kwargs.get("decoder_chunk_look_back", 0),
            "opt": None,
            "chunk_size": chunk_size,
        }
        cache["frontend"] = {}
        cache["prev_samples"] = np.zeros((0,), np.float32)
        return cache

    def generate_chunk(self, speech, speech_lengths, key=None, tokenizer=None,
                       frontend=None, cache: Optional[Dict] = None, **kwargs):
        is_final = kwargs.get("is_final", False)
        speech = jnp.asarray(speech)
        encoder_out, encoder_out_lens = self.encoder.forward_chunk(
            self.params_ref["encoder"], speech, jnp.asarray(speech_lengths),
            cache["encoder"], is_final=is_final)

        t = encoder_out.shape[1]
        embeds, n_fired, cache["encoder"]["cif_state"] = self.predictor.forward_chunk(
            self.params_ref["predictor"], encoder_out,
            cache["encoder"]["cif_state"], max_tokens=t + 1, is_final=is_final,
            chunk_size=cache["encoder"]["chunk_size"])
        n = int(n_fired[0])
        if n < 1:
            return []
        embeds = embeds[:, :n]
        logits = self.decoder.forward_chunk(self.params_ref["decoder"], encoder_out,
                                            embeds, cache["decoder"])
        yseq = np.asarray(jnp.argmax(logits, -1))[0]
        token_int = [int(x) for x in yseq
                     if x not in (self.blank_id, self.sos, self.eos)]
        return tokenizer.ids2tokens(token_int) if tokenizer is not None else token_int

    # ------------------------------------------------------------------

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, cache: Optional[Dict] = None,
                  **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)

        self.params_ref = params
        if cache is None:
            cache = {}
        if len(cache) == 0:
            self.init_cache(cache, **kwargs)

        meta: Dict = {}
        chunk_size = kwargs.get("chunk_size", [0, 10, 5])
        stride_samples = int(chunk_size[1] * 960)

        t0 = time.perf_counter()
        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs, audio_fs=kwargs.get("fs", 16000),
            data_type=kwargs.get("data_type", "sound"))
        is_final = kwargs.get("is_final", False) or isinstance(data_in, (str, bytes))
        meta["load_data"] = f"{time.perf_counter() - t0:0.3f}"
        assert len(audio_list) == 1, "streaming batch_size must be 1"

        audio = np.concatenate([cache["prev_samples"],
                                np.asarray(audio_list[0], np.float32)])
        n = int(len(audio) // stride_samples + int(is_final))
        m = int(len(audio) % stride_samples * (1 - int(is_final)))

        tokens: List[str] = []
        for i in range(n):
            final_i = is_final and i == n - 1
            chunk = audio[i * stride_samples: (i + 1) * stride_samples]
            if final_i and len(chunk) < 960:
                cache["encoder"]["tail_chunk"] = True
                feats = np.asarray(cache["encoder"]["feats"])
                flens = np.asarray([feats.shape[1]], np.int32)
            else:
                feats, flens = extract_fbank([chunk], frontend=frontend,
                                             cache=cache["frontend"],
                                             is_final=final_i)
            if feats.shape[1] == 0 and not final_i:
                continue
            meta["batch_data_time"] = (float(np.sum(flens))
                                       * frontend.frame_shift_ms
                                       * frontend.lfr_n / 1000)
            chunk_kwargs = {k: v for k, v in kwargs.items() if k != "is_final"}
            tokens_i = self.generate_chunk(feats, flens, key=key,
                                           tokenizer=tokenizer, frontend=frontend,
                                           cache=cache, is_final=final_i,
                                           **chunk_kwargs)
            tokens.extend(tokens_i)

        if tokenizer is not None:
            text, _ = postprocess_utils.sentence_postprocess(tokens)
        else:
            text = tokens
        cache["prev_samples"] = audio[-m:] if m > 0 else np.zeros((0,), np.float32)
        if is_final:
            self.init_cache(cache, **kwargs)
        if key is None:
            key = ["rand_key"]
        return [{"key": key[0], "text": text}], meta
