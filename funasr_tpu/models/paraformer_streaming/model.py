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
from functools import partial as _partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import funasr_tpu.models.scama.encoder  # noqa: F401 (registers SANMEncoderChunkOpt)
from funasr_tpu.models.paraformer.model import Paraformer
from funasr_tpu.register import tables
from funasr_tpu.utils import postprocess_utils


@_partial(jax.jit, static_argnames=("model", "enc_cfg", "chunk_size",
                                    "enc_look_back", "dec_look_back", "tail",
                                    "is_final"))
def _fused_chunk_jit(model, params, x, start, feats_carry, opt0, opt,
                     cif_state, dec_fsmn, dec_opt, enc_cfg, chunk_size,
                     enc_look_back, dec_look_back, tail, is_final):
    """The WHOLE streaming chunk — encoder + CIF + decoder + argmax — as ONE
    XLA program. The round-3 path ran these as three programs with a blocking
    fired-count fetch between CIF and decoder: on a tunneled chip each
    boundary costs a host round-trip (~28 ms), i.e. most of the 133 ms chunk
    p50. Fusing threads every cache functionally through one dispatch; the
    fired count rides back WITH the tokens in a single device_get. The
    decoder already decodes the padded (t+1)-token bucket with a traced
    valid-count, so no host decision is needed mid-program.

    Semantics preserved from the reference chunk loop
    (``funasr/models/paraformer_streaming/model.py:552-650``); parity pinned
    by tests/test_streaming_parity.py."""
    from funasr_tpu.models.scama.encoder import _encoder_chunk_jit

    y, new_carry, new_opt0, new_opt = _encoder_chunk_jit(
        params["encoder"], x, start, feats_carry, opt0, opt, enc_cfg,
        chunk_size, enc_look_back, tail)
    t = y.shape[1]
    embeds, n_fired, new_cif = model.predictor._forward_chunk_impl(
        params["predictor"], y, cif_state, max_tokens=t + 1,
        is_final=is_final, chunk_size=chunk_size)
    logits, new_fsmn, new_dec_opt = model.decoder._forward_chunk_impl(
        params["decoder"], y, embeds, n_fired[0], dec_fsmn, dec_opt,
        chunk_size, dec_look_back)
    yseq = jnp.argmax(logits, -1).astype(jnp.int32)
    return (yseq[0], n_fired, new_carry, new_opt0, new_opt, new_cif,
            new_fsmn, new_dec_opt)


@tables.register("model_classes", "ParaformerStreaming")
class ParaformerStreaming(Paraformer):
    def __init__(self, **kwargs):
        kwargs.setdefault("encoder", "SANMEncoderChunkOpt")
        super().__init__(**kwargs)
        self.kwargs_conf = kwargs

    # ------------------------------------------------------------------
    # training with overlap-chunk streaming masks
    # ------------------------------------------------------------------

    def _stacked_chunk_masks(self, l_max: int):
        """Build the per-config overlap-chunk masks at trace time and pad them
        to one common shape, so a single jitted program covers every training
        chunk size and the config is picked at runtime from the step rng
        (reference samples via ``overlap_chunk.random_choice``,
        paraformer_streaming/model.py:107-111)."""
        oc = self.encoder.overlap_chunk_cls
        n_cfg = len(oc.chunk_size)
        assert len(set(oc.pad_left)) == 1, "mixed pad_left is unsupported"
        per_cfg = [oc.gen_chunk_mask(np.asarray([l_max]), ind)
                   for ind in range(n_cfg)]
        lc = max(m["x_add_mask"].shape[0] for m in per_cfg)
        tp = max(m["x_add_mask"].shape[1] for m in per_cfg)

        def padto(a, shape):
            out = np.zeros(shape, a.dtype)
            out[tuple(slice(0, s) for s in a.shape)] = a
            return out

        stacked = {
            "x_add_mask": np.stack([padto(m["x_add_mask"], (lc, tp))
                                    for m in per_cfg]),
            "x_rm_mask": np.stack([padto(m["x_rm_mask"], (l_max, lc))
                                   for m in per_cfg]),
            "mask_shfit_chunk": np.stack(
                [padto(m["mask_shfit_chunk"], (lc,)) for m in per_cfg]),
            "mask_chunk_predictor": np.stack(
                [padto(m["mask_chunk_predictor"], (lc,)) for m in per_cfg]),
            "mask_att_chunk_encoder": np.stack(
                [padto(m["mask_att_chunk_encoder"], (lc, lc)) for m in per_cfg]),
        }
        cfgs = {
            "stride": np.asarray(oc.stride, np.int32),
            "shift": np.asarray([c + oc.shfit_fsmn for c in oc.chunk_size],
                                np.int32),
            "pad_left": np.asarray(oc.pad_left, np.int32),
        }
        return stacked, cfgs, oc.pad_left[0]

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths,
                    rng):
        """Training step with randomly-sampled streaming chunk masks: chunked
        encoder attention (own chunk + look-back), predictor alphas restricted
        to stride regions, CTC/decoder on the un-chunked sequence (reference
        ``paraformer_streaming/model.py`` forward with overlap_chunk; the
        non-scama decoder branch removes chunks before attention)."""
        import jax
        from funasr_tpu.core.layers import make_pad_mask
        from funasr_tpu.losses.label_smoothing_loss import (label_smoothing_loss,
                                                            th_accuracy)
        from funasr_tpu.models.paraformer.cif_predictor import mae_token_loss
        from funasr_tpu.models.paraformer.model import add_sos_eos_out
        from funasr_tpu.models.scama.chunk_utils import OverlapChunk

        batch_size = speech.shape[0]
        l_max = speech.shape[1]
        stacked, cfgs, pad_left = self._stacked_chunk_masks(int(l_max))
        k_enc, k_smp, k_cfg = jax.random.split(rng, 3)
        n_cfg = stacked["x_add_mask"].shape[0]
        ind = jax.random.randint(k_cfg, (), 0, n_cfg)

        stride = jnp.asarray(cfgs["stride"])[ind]
        shift = jnp.asarray(cfgs["shift"])[ind]
        # x_len_chunk = (n-1)*shift + shfit_fsmn + pad_left + len - (n-1)*stride
        shfit_fsmn = (self.encoder.cfg.kernel_size - 1) // 2
        n_chunks_row = jnp.ceil(speech_lengths / stride).astype(jnp.int32)
        lens_chunk = ((n_chunks_row - 1) * shift + shfit_fsmn + pad_left
                      + speech_lengths - (n_chunks_row - 1) * stride
                      ).astype(jnp.int32)

        masks = {
            "x_add_mask": jnp.asarray(stacked["x_add_mask"])[ind],
            "x_rm_mask": jnp.asarray(stacked["x_rm_mask"])[ind],
            "mask_shfit_chunk": jnp.asarray(stacked["mask_shfit_chunk"])[ind],
            "mask_chunk_predictor": jnp.asarray(
                stacked["mask_chunk_predictor"])[ind],
            "mask_att_chunk_encoder": jnp.asarray(
                stacked["mask_att_chunk_encoder"])[ind],
            "x_len_chunk": lens_chunk,
            "pad_left": pad_left,
        }
        if self.specaug is not None:
            speech, speech_lengths = self.specaug(speech, speech_lengths, k_enc)
        if self.normalize is not None:
            speech, speech_lengths = self.normalize(speech, speech_lengths)
        enc_chunk, enc_chunk_lens = self.encoder.forward_train_chunk(
            params["encoder"], speech, speech_lengths, masks)

        stats = {}
        # CTC on the un-chunked sequence (reference removes chunks for CTC)
        enc_plain = OverlapChunk.remove_chunk(enc_chunk, enc_chunk_lens, masks)
        loss_ctc = 0.0
        if self.ctc is not None and self.ctc_weight > 0.0:
            loss_ctc = self.ctc.loss(params["ctc"], enc_plain, speech_lengths,
                                     text, text_lengths)
            stats["loss_ctc"] = loss_ctc

        ys_pad, ys_pad_lens = text, text_lengths
        if self.predictor_bias == 1:
            ys_pad = add_sos_eos_out(text, text_lengths, self.eos, self.ignore_id)
            ys_pad_lens = text_lengths + 1

        # predictor on the chunked sequence: alphas only in stride regions
        tc = enc_chunk.shape[1]
        pad_ok = make_pad_mask(enc_chunk_lens, tc)
        pred_mask = pad_ok & jnp.asarray(masks["mask_chunk_predictor"], bool)[None]
        shfit_mask = jnp.asarray(masks["mask_shfit_chunk"],
                                 enc_chunk.dtype)[None, :, None]
        hidden = enc_chunk * shfit_mask
        max_tok = ys_pad.shape[1]
        pre_acoustic_embeds, pre_token_length, _, _ = self.predictor(
            params["predictor"], hidden, pred_mask, max_tok,
            target_length=ys_pad_lens)

        # decoder attends the un-chunked memory (non-scama decoder branch)
        if self.sampling_ratio > 0.0:
            sematic_embeds, dec_out_1st = self._sampler(
                params, k_smp, enc_plain, speech_lengths, ys_pad, ys_pad_lens,
                pre_acoustic_embeds)
        else:
            sematic_embeds, dec_out_1st = pre_acoustic_embeds, None
        decoder_out, _ = self.decoder(params["decoder"], enc_plain,
                                      speech_lengths, sematic_embeds,
                                      ys_pad_lens)
        if dec_out_1st is None:
            dec_out_1st = decoder_out

        loss_att = label_smoothing_loss(
            decoder_out, ys_pad, ignore_id=self.ignore_id,
            smoothing=self.lsm_weight, vocab_size=self.vocab_size,
            normalize_length=self.length_normalized_loss)
        loss_pre = mae_token_loss(ys_pad_lens, pre_token_length)
        acc_att = th_accuracy(dec_out_1st, ys_pad, self.ignore_id)
        if self.ctc is not None and self.ctc_weight > 0.0:
            loss = (self.ctc_weight * loss_ctc + (1 - self.ctc_weight) * loss_att
                    + loss_pre * self.predictor_weight)
        else:
            loss = loss_att + loss_pre * self.predictor_weight
        stats.update({"loss_att": loss_att, "loss_pre": loss_pre,
                      "acc": acc_att, "loss": loss, "batch_size": batch_size})
        weight = (jnp.sum(text_lengths + self.predictor_bias)
                  if self.length_normalized_loss else batch_size)
        return loss, stats, weight

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
        """One streaming chunk: ONE fused device program (encoder + CIF +
        decoder + argmax, :func:`_fused_chunk_jit`) and ONE result fetch."""
        from funasr_tpu.models.scama.encoder import _empty_kv

        is_final = kwargs.get("is_final", False)
        x = jnp.asarray(speech)
        b, t = x.shape[0], x.shape[1]
        enc_cache = cache["encoder"]
        dec_cache = cache["decoder"]
        params = self.params_ref
        cfg = self.encoder.cfg
        enc_look_back = enc_cache.get("encoder_chunk_look_back", 0)
        chunk_size = tuple(enc_cache["chunk_size"])
        if "opt0" not in enc_cache:  # same lazy init as encoder.forward_chunk
            empty = _empty_kv(b, cfg.attention_heads,
                              cfg.output_size // cfg.attention_heads, x.dtype)
            enc_cache["opt0"] = empty
            enc_cache["opt"] = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(
                    a[None], (cfg.num_blocks - 1,) + a.shape), empty) \
                if cfg.num_blocks > 1 else None
        dcfg = self.decoder.cfg
        if dec_cache.get("decode_fsmn") is None:
            dec_cache["decode_fsmn"] = jnp.zeros(
                (dcfg.num_blocks, b, dcfg.kernel_size - 1, cfg.output_size),
                x.dtype)
        dec_look_back = dec_cache.get("decoder_chunk_look_back", 0)
        if dec_cache.get("opt") is None and dec_look_back != 0:
            dk = dcfg.cross_cfg.d_k
            dec_cache["opt"] = {
                "k": jnp.zeros((dcfg.att_layer_num, b, dcfg.cross_cfg.n_head,
                                0, dk), x.dtype),
                "v": jnp.zeros((dcfg.att_layer_num, b, dcfg.cross_cfg.n_head,
                                0, dk), x.dtype)}
        start = enc_cache["start_idx"]
        enc_cache["start_idx"] = start + t

        (yseq, n_fired, new_carry, new_opt0, new_opt, new_cif, new_fsmn,
         new_dec_opt) = _fused_chunk_jit(
            self, params, x, jnp.asarray(start, jnp.int32),
            enc_cache["feats"], enc_cache["opt0"], enc_cache["opt"],
            enc_cache["cif_state"], dec_cache["decode_fsmn"],
            dec_cache.get("opt"), cfg, chunk_size, enc_look_back,
            dec_look_back, bool(enc_cache.get("tail_chunk")), bool(is_final))

        enc_cache["feats"] = new_carry
        if enc_look_back > 0 or enc_look_back == -1:
            enc_cache["opt0"] = new_opt0
            enc_cache["opt"] = new_opt
        enc_cache["cif_state"] = new_cif
        dec_cache["decode_fsmn"] = new_fsmn
        if dec_look_back > 0 or dec_look_back == -1:
            dec_cache["opt"] = new_dec_opt

        # ONE blocking fetch for tokens + fired count together
        yseq_np, n_np = jax.device_get((yseq, n_fired))
        n = int(n_np[0])
        if n < 1:
            return []
        token_int = [int(v) for v in yseq_np[:n]
                     if v not in (self.blank_id, self.sos, self.eos)]
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
