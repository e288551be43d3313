"""SCAMA: streaming chunk-aware multihead attention ASR (arXiv 2006.01712).

TPU-native rebuild of reference ``funasr/models/scama/model.py:44``: the
overlap-chunk SAN-M encoder runs offline with streaming masks, the CIF
predictor (restricted to stride rows via ``mask_chunk_predictor``) both counts
tokens and yields per-frame fire alignments, and the autoregressive FSMN
decoder cross-attends through the SCAMA per-token chunk windows — so training
sees exactly the attention pattern streaming inference will have.

Losses: label-smoothed attention CE + CTC (on de-chunked encoder output) +
predictor MAE (ref :200-275).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import make_pad_mask
from funasr_tpu.losses.label_smoothing_loss import (label_smoothing_loss,
                                                    th_accuracy)
from funasr_tpu.models.ctc.ctc import CTC
from funasr_tpu.models.paraformer.cif_predictor import mae_token_loss
from funasr_tpu.models.scama.chunk_utils import OverlapChunk
from funasr_tpu.models.scama.utils import (
    build_scama_mask_for_cross_attention_decoder, gen_frame_alignments)
from funasr_tpu.models.transformer.model import add_sos_eos
from funasr_tpu.register import tables


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("self",))
def _scama_greedy_step_jit(self, params, enc, enc_lens, ys, scama_mask, step):
    """One greedy step over the PADDED target buffer: decoder forward with a
    (step+1)-length mask, argmax at position ``step``."""
    b = enc.shape[0]
    lens = jnp.full((b,), step + 1, jnp.int32)
    # the scama mask covers max_tokens target rows; the write buffer has one
    # extra slot for the final append, excluded from the decode input
    logits, _ = self.decoder(params["decoder"], enc, enc_lens,
                             ys[:, : scama_mask.shape[1]], lens,
                             chunk_mask=scama_mask)
    row = jnp.take_along_axis(
        logits, step[None, None, None].repeat(b, 0).repeat(
            logits.shape[-1], -1), axis=1)[:, 0]
    return jnp.argmax(row, axis=-1).astype(jnp.int32)


@tables.register("model_classes", "SCAMA")
class SCAMA:
    def __init__(self, specaug: Optional[str] = None, specaug_conf=None,
                 normalize: Optional[str] = None, normalize_conf=None,
                 encoder: str = "SANMEncoderChunkOpt", encoder_conf=None,
                 decoder: str = "FsmnDecoderSCAMAOpt", decoder_conf=None,
                 ctc: str = "CTC", ctc_conf=None, ctc_weight: float = 0.5,
                 predictor: str = "CifPredictorV2", predictor_conf=None,
                 predictor_bias: int = 0, predictor_weight: float = 0.0,
                 input_size: int = 80, vocab_size: int = -1,
                 ignore_id: int = -1, blank_id: int = 0, sos: int = 1,
                 eos: int = 2, lsm_weight: float = 0.0,
                 length_normalized_loss: bool = False,
                 decoder_attention_chunk_type: str = "chunk", **kwargs):
        self.encoder = tables.encoder_classes[encoder](
            input_size=input_size, **(encoder_conf or {}))
        enc_out = self.encoder.output_size()
        self.decoder = tables.decoder_classes[decoder](
            vocab_size=vocab_size, encoder_output_size=enc_out,
            **(decoder_conf or {}))
        self.ctc = CTC(odim=vocab_size, encoder_output_size=enc_out,
                       **(ctc_conf or {})) if ctc_weight > 0 else None
        pred_conf = dict(predictor_conf or {})
        pred_conf.setdefault("idim", enc_out)
        self.predictor = tables.predictor_classes[predictor](**pred_conf)
        self.specaug = (tables.specaug_classes[specaug](**(specaug_conf or {}))
                        if specaug else None)
        self.normalize = (tables.normalize_classes[normalize](
            **(normalize_conf or {})) if normalize else None)
        self.vocab_size = vocab_size
        self.ignore_id = ignore_id
        self.blank_id = blank_id
        self.sos, self.eos = sos, eos
        self.ctc_weight = ctc_weight
        self.predictor_bias = predictor_bias
        self.predictor_weight = predictor_weight
        self.lsm_weight = lsm_weight
        self.length_normalized_loss = length_normalized_loss
        self.decoder_attention_chunk_type = decoder_attention_chunk_type
        self.overlap_chunk_cls: OverlapChunk = self.encoder.overlap_chunk_cls

    def init_params(self, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        p = {"encoder": self.encoder.init(k1), "decoder": self.decoder.init(k2),
             "predictor": self.predictor.init(k4)}
        if self.ctc is not None:
            p["ctc"] = self.ctc.init(k3)
        return p

    # ------------------------------------------------------------------

    def encode_chunked(self, params, speech, speech_lengths, masks, rng=None):
        if self.specaug is not None and rng is not None:
            speech, speech_lengths = self.specaug(speech, speech_lengths, rng)
        if self.normalize is not None:
            speech, speech_lengths = self.normalize(speech, speech_lengths)
        return self.encoder.forward_train_chunk(params["encoder"], speech,
                                                speech_lengths, masks, rng=rng)

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths,
                    rng=None, masks: Optional[Dict] = None, ind: int = 0):
        """``masks``: host-built ``OverlapChunk.gen_chunk_mask`` dict for this
        batch's max length (the trainer samples a chunk config per step,
        mirroring reference ``random_choice``/``decoding_ind``)."""
        if masks is None:
            masks = self.overlap_chunk_cls.gen_chunk_mask(
                np.asarray([int(speech.shape[1])]), ind)
        enc_chunk, enc_lens_chunk = self.encode_chunked(
            params, speech, speech_lengths, masks, rng=rng)

        stats: Dict = {}
        loss_ctc = 0.0
        if self.ctc is not None:
            enc_ctc = OverlapChunk.remove_chunk(enc_chunk, enc_lens_chunk,
                                                masks)
            loss_ctc = self.ctc.loss(params["ctc"],
                                     enc_ctc[:, : int(speech.shape[1])],
                                     speech_lengths, text, text_lengths)
            stats["loss_ctc"] = loss_ctc

        loss_att, acc_att, loss_pre = self._att_predictor_loss(
            params, enc_chunk, enc_lens_chunk, text, text_lengths, masks, ind)
        loss = (self.ctc_weight * loss_ctc
                + (1 - self.ctc_weight) * loss_att
                + self.predictor_weight * loss_pre) if self.ctc is not None \
            else loss_att + self.predictor_weight * loss_pre
        stats.update(loss_att=loss_att, acc=acc_att, loss_pre=loss_pre,
                     loss=loss)
        return loss, stats, speech.shape[0]

    forward = forward_jit

    def _att_predictor_loss(self, params, enc, enc_lens, ys_pad, ys_lens,
                            masks: Dict, ind: int):
        ys_in, ys_out = add_sos_eos(ys_pad, ys_lens, self.sos, self.eos,
                                    self.ignore_id)
        ys_in_lens = ys_lens + 1
        t_chunk = enc.shape[1]
        enc_mask = make_pad_mask(enc_lens, t_chunk)

        mask_chunk_pred = jnp.asarray(masks["mask_chunk_predictor"],
                                      jnp.float32)[: t_chunk]
        mask_shfit = jnp.asarray(masks["mask_shfit_chunk"],
                                 jnp.float32)[: t_chunk]
        enc = enc * mask_shfit[None, :, None]
        pred_mask = enc_mask & (mask_chunk_pred[None] > 0)

        max_tokens = ys_in.shape[1]
        acoustic_embeds, pre_token_length, pre_alphas, _ = self.predictor(
            params["predictor"], enc, pred_mask, max_tokens,
            target_length=ys_in_lens)

        alignments, _ = gen_frame_alignments(pre_alphas[:, : t_chunk],
                                             enc_lens, max_tokens,
                                             training=True)
        chunk_cfg = self.overlap_chunk_cls
        enc_chunk_size = chunk_cfg.chunk_size[ind] + chunk_cfg.shfit_fsmn
        scama_mask = build_scama_mask_for_cross_attention_decoder(
            alignments, enc_lens, max_target_length=max_tokens,
            chunk_size=1, encoder_chunk_size=enc_chunk_size,
            attention_chunk_size=enc_chunk_size,
            attention_chunk_type=self.decoder_attention_chunk_type,
            predictor_mask_chunk_hopping=mask_chunk_pred,
            decoder_att_look_back_factor=chunk_cfg.dec_look_back[ind],
            mask_shift_att_chunk_decoder=mask_shfit,
            target_length=ys_in_lens, is_training=True)

        logits, _ = self.decoder(params["decoder"], enc, enc_lens, ys_in,
                                 ys_in_lens, chunk_mask=scama_mask,
                                 pre_acoustic_embeds=acoustic_embeds)
        loss_att = label_smoothing_loss(logits, ys_out, self.ignore_id,
                                        self.lsm_weight, self.vocab_size,
                                        self.length_normalized_loss)
        acc = th_accuracy(logits, ys_out, self.ignore_id)
        loss_pre = mae_token_loss(ys_in_lens.astype(jnp.float32),
                                  pre_token_length,
                                  self.length_normalized_loss)
        return loss_att, acc, loss_pre

    # ------------------------------------------------------------------

    def inference(self, params, data_in, data_lengths=None,
                  key: Optional[List] = None, tokenizer=None, frontend=None,
                  **kwargs):
        """Offline decode through the streaming graph: chunked encoder +
        CIF token count + greedy AR decode under the SCAMA attention windows
        (the reference drives the same graph through its beam search)."""
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)
        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs if frontend else 16000,
            audio_fs=kwargs.get("fs", 16000))
        feats, feat_lens = extract_fbank(audio_list, frontend=frontend)
        ind = int(kwargs.get("decoding_ind", 0) or 0)
        masks = self.overlap_chunk_cls.gen_chunk_mask(np.asarray(feat_lens),
                                                      ind)
        enc, enc_lens = self.encoder.forward_train_chunk(
            params["encoder"], jnp.asarray(feats), jnp.asarray(feat_lens),
            masks)
        t_chunk = enc.shape[1]
        mask_chunk_pred = jnp.asarray(masks["mask_chunk_predictor"],
                                      jnp.float32)[: t_chunk]
        mask_shfit = jnp.asarray(masks["mask_shfit_chunk"],
                                 jnp.float32)[: t_chunk]
        enc = enc * mask_shfit[None, :, None]
        pred_mask = make_pad_mask(enc_lens, t_chunk) & (mask_chunk_pred[None]
                                                        > 0)
        alphas = self.predictor.alphas(params["predictor"], enc, pred_mask)
        token_num = jnp.floor(jnp.sum(alphas, axis=1)).astype(jnp.int32)
        max_tokens = max(int(jnp.max(token_num)), 1) + 1
        alignments, _ = gen_frame_alignments(alphas, enc_lens, max_tokens,
                                             training=False)
        chunk_cfg = self.overlap_chunk_cls
        enc_chunk_size = chunk_cfg.chunk_size[ind] + chunk_cfg.shfit_fsmn
        scama_mask = build_scama_mask_for_cross_attention_decoder(
            alignments, enc_lens, max_target_length=max_tokens,
            chunk_size=1, encoder_chunk_size=enc_chunk_size,
            attention_chunk_size=enc_chunk_size,
            attention_chunk_type=self.decoder_attention_chunk_type,
            predictor_mask_chunk_hopping=mask_chunk_pred,
            decoder_att_look_back_factor=chunk_cfg.dec_look_back[ind],
            mask_shift_att_chunk_decoder=mask_shfit, is_training=False)

        b = enc.shape[0]
        # greedy AR decode at FIXED shape: ys padded to max_tokens+1 with a
        # per-step valid length — one compiled program for every step (pad
        # rows are length-masked throughout the decoder, so logits[:, step]
        # equals the prefix-only forward the eager loop computed)
        ys = jnp.full((b, max_tokens + 1), self.eos, jnp.int32)
        ys = ys.at[:, 0].set(self.sos)
        for step in range(max_tokens):
            nxt = _scama_greedy_step_jit(self, params, enc, enc_lens, ys,
                                         scama_mask,
                                         jnp.asarray(step, jnp.int32))
            ys = ys.at[:, step + 1].set(nxt)
        hyps = np.asarray(ys[:, 1:])
        token_num_np = np.asarray(token_num)
        results = []
        if key is None:
            key = [f"rand_key_{i}" for i in range(b)]
        for i in range(b):
            ids = [int(t) for t in hyps[i][: int(token_num_np[i])]
                   if int(t) not in (self.sos, self.eos, self.blank_id)]
            text = tokenizer.decode(ids) if tokenizer is not None else \
                " ".join(map(str, ids))
            results.append({"key": key[i], "text": text,
                            "token_num": int(token_num_np[i])})
        return results, {}
