"""SeACo-Paraformer: semantic-context hotword biasing (the ``paraformer-zh`` alias).

TPU-native rebuild of the reference (FunASR ``funasr/models/seaco_paraformer/
model.py:49-420``): 2-layer LSTM bias encoder over hotword token lists (last-valid
hidden per hotword, ``_hotword_representation:365``), a SANM "seaco decoder" attending
token queries (CIF embeds and decoder hiddens) to the hotword memory, merged with a
NO_BIAS gate (``_seaco_decode_with_ASF:256-360``), attention-score filtering (ASF) to
the top-nfilter hotwords; inherits BiCIF timestamps.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import linear_apply, linear_init, lstm_apply, lstm_init
from funasr_tpu.models.bicif_paraformer.model import BiCifParaformer
from funasr_tpu.register import tables
from funasr_tpu.utils import postprocess_utils
from funasr_tpu.utils.timestamp_tools import ts_prediction_lfr6_standard


@tables.register("model_classes", "SeacoParaformer")
class SeacoParaformer(BiCifParaformer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.inner_dim = kwargs.get("inner_dim", 256)
        self.bias_encoder_type = kwargs.get("bias_encoder_type", "lstm")
        self.seaco_weight = kwargs.get("seaco_weight", 0.01)
        self.NO_BIAS = kwargs.get("NO_BIAS", 8377)
        seaco_decoder = kwargs.get("seaco_decoder")
        self.seaco_decoder = None
        if seaco_decoder is not None:
            self.seaco_decoder = tables.decoder_classes[seaco_decoder](
                vocab_size=self.vocab_size, encoder_output_size=self.inner_dim,
                **(kwargs.get("seaco_decoder_conf") or {}))

    def init_params(self, rng):
        params = super().init_params(rng)
        k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(rng, 11), 4)
        params["bias_encoder"] = [lstm_init(k1, self.inner_dim, self.inner_dim),
                                  lstm_init(k2, self.inner_dim, self.inner_dim)]
        if self.seaco_decoder is not None:
            params["seaco_decoder"] = self.seaco_decoder.init(k3)
        params["hotword_output_layer"] = linear_init(k4, self.inner_dim,
                                                     self.vocab_size)
        return params

    # ------------------------------------------------------------------

    def _hotword_representation(self, params, hotword_pad, hotword_lengths):
        """(N, L) hotword token ids -> (N, inner_dim): 2-layer LSTM, last valid step."""
        hw_embed = self.decoder.embed(params["decoder"], hotword_pad)
        h = lstm_apply(params["bias_encoder"][0], hw_embed)
        h = lstm_apply(params["bias_encoder"][1], h)
        idx = jnp.maximum(hotword_lengths - 1, 0)
        return jnp.take_along_axis(h, idx[:, None, None].repeat(h.shape[-1], -1),
                                   axis=1)[:, 0]

    def _seaco_decode_with_asf(self, params, encoder_out, encoder_out_lens,
                               sematic_embeds, ys_pad_lens, hw_list,
                               nfilter: int = 50, seaco_weight: float = 1.0):
        """hw_list: list of token-id lists, last entry = the no-bias sentinel."""
        decoder_out, ys_pad_lens_ = self.decoder(
            params["decoder"], encoder_out, encoder_out_lens, sematic_embeds,
            ys_pad_lens)
        decoder_hidden, _ = self.decoder(
            params["decoder"], encoder_out, encoder_out_lens, sematic_embeds,
            ys_pad_lens, return_hidden=True)
        decoder_pred = jax.nn.log_softmax(decoder_out.astype(jnp.float32), -1)
        if hw_list is None or self.seaco_decoder is None:
            return decoder_pred

        hw_lengths = np.asarray([len(h) for h in hw_list], np.int32)
        maxlen = int(hw_lengths.max())
        hw_pad = np.zeros((len(hw_list), maxlen), np.int32)
        for i, h in enumerate(hw_list):
            hw_pad[i, : len(h)] = h
        selected = self._hotword_representation(params, jnp.asarray(hw_pad),
                                                jnp.asarray(hw_lengths))

        b = encoder_out.shape[0]

        def ctx(sel):
            n = sel.shape[0]
            info = jnp.tile(sel[None], (b, 1, 1))
            lens = jnp.full((b,), n, jnp.int32)
            return info, lens

        contextual_info, ctx_lens = ctx(selected)
        num_hot_word = selected.shape[0]

        if 0 < nfilter < num_hot_word:
            # ASF: cross-attention scores of the seaco decoder's probe layer
            scores = self.seaco_decoder.forward_asf(
                params["seaco_decoder"], contextual_info, ctx_lens,
                decoder_hidden, ys_pad_lens)
            scores = np.asarray(jnp.sum(scores[0], axis=(0, 1)))
            # reference model.py:329-333: topk over ALL entries (the no-bias tail
            # included, so it may appear twice in the kept memory), then the
            # no-bias index is appended unconditionally
            top = np.argsort(-scores)[: min(nfilter, num_hot_word - 1)]
            keep = list(top) + [num_hot_word - 1]
            selected = selected[np.asarray(keep)]
            contextual_info, ctx_lens = ctx(selected)

        cif_attended, _ = self.seaco_decoder(
            params["seaco_decoder"], contextual_info, ctx_lens, sematic_embeds,
            ys_pad_lens, return_hidden=True)
        dec_attended, _ = self.seaco_decoder(
            params["seaco_decoder"], contextual_info, ctx_lens, decoder_hidden,
            ys_pad_lens, return_hidden=True)
        merged = cif_attended + dec_attended
        dha_out = linear_apply(params["hotword_output_layer"], merged)
        dha_pred = jax.nn.log_softmax(dha_out.astype(jnp.float32), -1)

        lmbd = seaco_weight
        dha_ids = jnp.argmax(dha_pred, -1)
        dha_mask = (dha_ids == self.NO_BIAS).astype(jnp.float32)[..., None]
        dha_mask = (dha_mask + (1 - lmbd) / lmbd) / (1 / lmbd)
        return decoder_pred * dha_mask + dha_pred * (1 - dha_mask)

    # ------------------------------------------------------------------

    def _proc_hotword(self, hotword, tokenizer) -> Optional[List[List[int]]]:
        """Hotword string ("word1 word2") or list -> token-id lists + no-bias tail
        (reference helper behavior; '<s>' sentinel encodes to sos)."""
        if not hotword:
            return None
        if isinstance(hotword, str):
            hotword = hotword.strip().split()
        hw_list = [tokenizer.encode(w) for w in hotword]
        hw_list.append([self.sos])
        return hw_list

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

        hw_list = self._proc_hotword(kwargs.get("hotword"), tokenizer) \
            if tokenizer is not None else None

        # jit-cached, bucketed encoder+CIF front half; the seaco decode stage
        # stays eager (hotword-list shapes vary and ASF round-trips the host)
        (encoder_out, encoder_out_lens, pre_acoustic_embeds, token_lens,
         alphas, peaks, b_real) = self.encode_predict_bucketed(
            params, speech, speech_lengths)
        merged_pred = self._seaco_decode_with_asf(
            params, encoder_out, encoder_out_lens, pre_acoustic_embeds, token_lens,
            hw_list, nfilter=kwargs.get("nfilter", 50),
            seaco_weight=kwargs.get("seaco_weight", 1.0))

        from funasr_tpu.core.layers import make_pad_mask
        k = pre_acoustic_embeds.shape[1]
        tok_valid = make_pad_mask(token_lens, k)
        yseq = np.asarray(jnp.where(tok_valid, jnp.argmax(merged_pred, -1),
                                    self.blank_id))
        token_lens_np = np.asarray(token_lens)

        # timestamps from the upsample head (production seaco uses CifPredictorV3;
        # a V2-configured variant has no upsample head, so skip timestamps)
        us_alphas = us_peaks = None
        if hasattr(self.predictor, "get_upsample_timestamp"):
            mask = make_pad_mask(encoder_out_lens, encoder_out.shape[1])
            _, _, us_alphas, us_peaks = self.predictor.get_upsample_timestamp(
                params["predictor"], encoder_out, mask,
                token_num=token_lens.astype(jnp.float32))
            us_alphas, us_peaks = np.asarray(us_alphas), np.asarray(us_peaks)
            up = self.predictor.upsample_times
        enc_lens = np.asarray(encoder_out_lens)

        results = []
        b = b_real
        if key is None:
            key = [f"rand_key_{i}" for i in range(b)]
        for i in range(b):
            token_int = [int(t) for t in yseq[i, : token_lens_np[i]]
                         if t not in (self.blank_id, self.sos, self.eos)]
            if tokenizer is None:
                results.append({"key": key[i], "token_int": token_int})
                continue
            token = tokenizer.ids2tokens(token_int)
            if us_alphas is not None:
                n_us = int(enc_lens[i]) * up
                _, timestamp = ts_prediction_lfr6_standard(
                    us_alphas[i, :n_us], us_peaks[i, :n_us], list(token),
                    vad_offset=kwargs.get("begin_time", 0), upsample_rate=up)
                text, timestamp, _ = postprocess_utils.sentence_postprocess(
                    token, timestamp)
                results.append({"key": key[i], "text": text,
                                "timestamp": timestamp})
            else:
                text, _ = postprocess_utils.sentence_postprocess(token)
                results.append({"key": key[i], "text": text})
        return results, meta
