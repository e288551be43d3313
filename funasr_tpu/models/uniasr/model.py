"""UniASR: unified 2-pass streaming ASR (low-latency pass 1 + accurate pass 2).

TPU-native rebuild of FunASR ``funasr/models/uniasr/model.py:26`` on top of the
SCAMA machinery (``funasr/models/scama``): pass 1 = overlap-chunk SAN-M encoder
-> CIF predictor -> SCAMA-masked FSMN decoder (streaming); pass 2 = stride-conv
over [features || de-chunked pass-1 states] -> a second overlap-chunk encoder
-> CIF2 -> SCAMA-masked decoder2 (accurate finals). Loss mixes the passes with
``loss_weight_model1`` (ref :274-346). Pass selection at inference mirrors the
reference ``decoding_model`` switch (fast = pass 1, normal/offline = pass 2).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import funasr_tpu.models.scama.decoder  # noqa: F401 (registers FsmnDecoderSCAMAOpt)
import funasr_tpu.models.scama.encoder  # noqa: F401 (registers SANMEncoderChunkOpt)
from funasr_tpu.core.layers import make_pad_mask
from funasr_tpu.losses.label_smoothing_loss import (label_smoothing_loss,
                                                    th_accuracy)
from funasr_tpu.models.paraformer.cif_predictor import mae_token_loss
from funasr_tpu.models.scama.chunk_utils import OverlapChunk
from funasr_tpu.models.scama.utils import (
    build_scama_mask_for_cross_attention_decoder, gen_frame_alignments)
from funasr_tpu.models.transformer.model import add_sos_eos
from funasr_tpu.register import tables
from funasr_tpu.utils import postprocess_utils


def conv1d_subsampling_init(rng, idim: int, odim: int, kernel_size: int):
    from funasr_tpu.core.layers import conv1d_init
    return conv1d_init(rng, idim, odim, kernel_size)


@tables.register("model_classes", "UniASR")
class UniASR:
    def __init__(self, specaug=None, specaug_conf=None, normalize=None,
                 normalize_conf=None,
                 encoder: str = "SANMEncoderChunkOpt", encoder_conf=None,
                 encoder2: str = "SANMEncoderChunkOpt", encoder2_conf=None,
                 decoder: str = "FsmnDecoderSCAMAOpt", decoder_conf=None,
                 decoder2: str = "FsmnDecoderSCAMAOpt", decoder2_conf=None,
                 predictor: str = "CifPredictorV2", predictor_conf=None,
                 predictor2: str = "CifPredictorV2", predictor2_conf=None,
                 stride_conv: str = "stride_conv1d", stride_conv_conf=None,
                 input_size: int = 560, vocab_size: int = -1,
                 ignore_id: int = -1, blank_id: int = 0, sos: int = 1,
                 eos: int = 2, lsm_weight: float = 0.0,
                 predictor_weight: float = 1.0, predictor2_weight: float = 1.0,
                 predictor_bias: int = 0, predictor2_bias: int = 0,
                 ctc_weight: float = 0.0, ctc_weight2: float = 0.0,
                 loss_weight_model1: float = 0.5,
                 decoder_attention_chunk_type: str = "chunk",
                 decoder_attention_chunk_type2: str = "chunk",
                 length_normalized_loss: bool = False, **kwargs):
        self.encoder = tables.encoder_classes[encoder](
            input_size=input_size, **(encoder_conf or {}))
        enc1_out = self.encoder.output_size()
        self.decoder = tables.decoder_classes[decoder](
            vocab_size=vocab_size, encoder_output_size=enc1_out,
            **(decoder_conf or {}))
        pred_conf = dict(predictor_conf or {})
        pred_conf.setdefault("idim", enc1_out)
        self.predictor = tables.predictor_classes[predictor](**pred_conf)

        # pass-2 front: stride conv over [features || de-chunked pass-1 states]
        # (ref model.py:148-155: idim = odim = input_size + enc1_out)
        sc_conf = dict(stride_conv_conf or {})
        self.stride = sc_conf.get("stride", 2)
        self.stride_kernel = sc_conf.get("kernel_size", 2)
        pad = sc_conf.get("pad", (0, 1))
        self.stride_pad = tuple(pad) if not isinstance(pad, int) else (pad, pad)
        self._stride_in = input_size + enc1_out
        self.stride_out = self._stride_in
        self.encoder2 = tables.encoder_classes[encoder2](
            input_size=self.stride_out, **(encoder2_conf or {}))
        enc2_out = self.encoder2.output_size()
        self.decoder2 = tables.decoder_classes[decoder2](
            vocab_size=vocab_size, encoder_output_size=enc2_out,
            **(decoder2_conf or {}))
        pred2_conf = dict(predictor2_conf or predictor_conf or {})
        pred2_conf.setdefault("idim", enc2_out)
        self.predictor2 = tables.predictor_classes[predictor2](**pred2_conf)

        self.specaug = (tables.specaug_classes[specaug](**(specaug_conf or {}))
                        if specaug else None)
        self.normalize = (tables.normalize_classes[normalize](
            **(normalize_conf or {})) if normalize else None)
        self.vocab_size = vocab_size
        self.ignore_id = ignore_id
        self.blank_id = blank_id
        self.sos, self.eos = sos, eos
        self.lsm_weight = lsm_weight
        self.predictor_weight = predictor_weight
        self.predictor2_weight = predictor2_weight
        self.predictor_bias = predictor_bias
        self.predictor2_bias = predictor2_bias
        self.loss_weight_model1 = loss_weight_model1
        self.decoder_attention_chunk_type = decoder_attention_chunk_type
        self.decoder_attention_chunk_type2 = decoder_attention_chunk_type2
        self.length_normalized_loss = length_normalized_loss

    def init_params(self, rng):
        keys = jax.random.split(rng, 7)
        return {
            "encoder": self.encoder.init(keys[0]),
            "decoder": self.decoder.init(keys[1]),
            "predictor": self.predictor.init(keys[2]),
            "stride_conv": conv1d_subsampling_init(
                keys[3], self._stride_in, self.stride_out, self.stride_kernel),
            "encoder2": self.encoder2.init(keys[4]),
            "decoder2": self.decoder2.init(keys[5]),
            "predictor2": self.predictor2.init(keys[6]),
        }

    # ------------------------------------------------------------------

    def _stride_conv(self, params, x, lens):
        """Conv1dSubsampling (ref subsampling.py:332-388): pad, conv, relu."""
        from funasr_tpu.core.layers import conv1d_apply
        h = conv1d_apply(params["stride_conv"], x,
                         left_pad=self.stride_pad[0],
                         right_pad=self.stride_pad[1], stride=self.stride)
        h = jax.nn.relu(h)
        return h, (lens - 1) // self.stride + 1

    def _scama_pass_loss(self, params, enc, enc_lens, text, text_lengths,
                         masks: Dict, ind: int, which: str):
        """Shared per-pass attention + predictor loss under SCAMA masks."""
        sfx = "" if which == "1" else "2"
        predictor = self.predictor if which == "1" else self.predictor2
        decoder = self.decoder if which == "1" else self.decoder2
        chunk_cfg: OverlapChunk = (self.encoder if which == "1"
                                   else self.encoder2).overlap_chunk_cls
        att_type = self.decoder_attention_chunk_type if which == "1" \
            else self.decoder_attention_chunk_type2
        bias = self.predictor_bias if which == "1" else self.predictor2_bias
        pw = self.predictor_weight if which == "1" else self.predictor2_weight

        ys_in, ys_out = add_sos_eos(text, text_lengths, self.sos, self.eos,
                                    self.ignore_id)
        ys_in_lens = text_lengths + 1
        if bias == 0:
            ys_in, ys_out, ys_in_lens = text, text, text_lengths
        t_chunk = enc.shape[1]
        mask_chunk_pred = jnp.asarray(masks["mask_chunk_predictor"],
                                      jnp.float32)[: t_chunk]
        mask_shfit = jnp.asarray(masks["mask_shfit_chunk"],
                                 jnp.float32)[: t_chunk]
        enc = enc * mask_shfit[None, :, None]
        pred_mask = make_pad_mask(enc_lens, t_chunk) & (mask_chunk_pred[None]
                                                        > 0)
        max_tokens = ys_in.shape[1]
        acoustic_embeds, pre_token_length, pre_alphas, _ = predictor(
            params["predictor" + sfx], enc, pred_mask, max_tokens,
            target_length=ys_in_lens)
        alignments, _ = gen_frame_alignments(pre_alphas[:, : t_chunk],
                                             enc_lens, max_tokens,
                                             training=True)
        enc_chunk_size = chunk_cfg.chunk_size[ind] + chunk_cfg.shfit_fsmn
        scama_mask = build_scama_mask_for_cross_attention_decoder(
            alignments, enc_lens, max_target_length=max_tokens,
            chunk_size=1, encoder_chunk_size=enc_chunk_size,
            attention_chunk_size=enc_chunk_size,
            attention_chunk_type=att_type,
            predictor_mask_chunk_hopping=mask_chunk_pred,
            decoder_att_look_back_factor=chunk_cfg.dec_look_back[ind],
            mask_shift_att_chunk_decoder=mask_shfit,
            target_length=ys_in_lens, is_training=True)
        logits, _ = decoder(params["decoder" + sfx], enc, enc_lens, ys_in,
                            ys_in_lens, chunk_mask=scama_mask,
                            pre_acoustic_embeds=acoustic_embeds)
        loss_att = label_smoothing_loss(logits, ys_out, self.ignore_id,
                                        self.lsm_weight, self.vocab_size,
                                        self.length_normalized_loss)
        acc = th_accuracy(logits, ys_out, self.ignore_id)
        loss_pre = mae_token_loss(ys_in_lens.astype(jnp.float32),
                                  pre_token_length,
                                  self.length_normalized_loss)
        return loss_att + pw * loss_pre, loss_att, loss_pre, acc

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths,
                    rng=None, masks: Optional[Dict] = None,
                    masks2: Optional[Dict] = None, ind: int = 0):
        if self.specaug is not None and rng is not None:
            speech, speech_lengths = self.specaug(speech, speech_lengths, rng)
        if self.normalize is not None:
            speech, speech_lengths = self.normalize(speech, speech_lengths)
        if masks is None:
            masks = self.encoder.overlap_chunk_cls.gen_chunk_mask(
                np.asarray([int(speech.shape[1])]), ind)
        enc1, enc1_lens = self.encoder.forward_train_chunk(
            params["encoder"], speech, speech_lengths, masks, rng=rng)

        stats: Dict = {}
        loss1 = 0.0
        if self.loss_weight_model1 > 0.0:
            loss1, att1, pre1, acc1 = self._scama_pass_loss(
                params, enc1, enc1_lens, text, text_lengths, masks, ind, "1")
            stats.update(loss_att=att1, loss_pre=pre1, acc=acc1)

        loss2 = 0.0
        if self.loss_weight_model1 < 1.0:
            # de-chunk pass-1 states, fuse with features, stride, re-chunk
            enc1_rm = OverlapChunk.remove_chunk(enc1, enc1_lens, masks)
            enc1_rm = enc1_rm[:, : speech.shape[1]]
            fused = jnp.concatenate([speech.astype(enc1_rm.dtype), enc1_rm],
                                    axis=-1)
            strided, lens2 = self._stride_conv(params, fused, speech_lengths)
            if masks2 is None:
                masks2 = self.encoder2.overlap_chunk_cls.gen_chunk_mask(
                    np.asarray([int(strided.shape[1])]), ind)
            enc2, enc2_lens = self.encoder2.forward_train_chunk(
                params["encoder2"], strided, lens2, masks2, rng=rng)
            loss2, att2, pre2, acc2 = self._scama_pass_loss(
                params, enc2, enc2_lens, text, text_lengths, masks2, ind, "2")
            stats.update(loss_att2=att2, loss_pre2=pre2, acc2=acc2)

        loss = loss1 * self.loss_weight_model1 \
            + loss2 * (1 - self.loss_weight_model1)
        stats.update(loss1=loss1, loss2=loss2, loss=loss)
        return loss, stats, speech.shape[0]

    forward = forward_jit

    # ------------------------------------------------------------------

    def _decode_pass(self, params, enc, enc_lens, masks, ind: int, which: str,
                     tokenizer):
        """Greedy AR decode of one pass through its SCAMA attention windows."""
        sfx = "" if which == "1" else "2"
        predictor = self.predictor if which == "1" else self.predictor2
        decoder = self.decoder if which == "1" else self.decoder2
        chunk_cfg: OverlapChunk = (self.encoder if which == "1"
                                   else self.encoder2).overlap_chunk_cls
        att_type = self.decoder_attention_chunk_type if which == "1" \
            else self.decoder_attention_chunk_type2
        t_chunk = enc.shape[1]
        mask_chunk_pred = jnp.asarray(masks["mask_chunk_predictor"],
                                      jnp.float32)[: t_chunk]
        mask_shfit = jnp.asarray(masks["mask_shfit_chunk"],
                                 jnp.float32)[: t_chunk]
        enc = enc * mask_shfit[None, :, None]
        pred_mask = make_pad_mask(enc_lens, t_chunk) & (mask_chunk_pred[None]
                                                        > 0)
        alphas = predictor.alphas(params["predictor" + sfx], enc, pred_mask)
        token_num = jnp.floor(jnp.sum(alphas, axis=1)).astype(jnp.int32)
        max_tokens = max(int(jnp.max(token_num)), 1) + 1
        alignments, _ = gen_frame_alignments(alphas, enc_lens, max_tokens,
                                             training=False)
        enc_chunk_size = chunk_cfg.chunk_size[ind] + chunk_cfg.shfit_fsmn
        scama_mask = build_scama_mask_for_cross_attention_decoder(
            alignments, enc_lens, max_target_length=max_tokens,
            chunk_size=1, encoder_chunk_size=enc_chunk_size,
            attention_chunk_size=enc_chunk_size, attention_chunk_type=att_type,
            predictor_mask_chunk_hopping=mask_chunk_pred,
            decoder_att_look_back_factor=chunk_cfg.dec_look_back[ind],
            mask_shift_att_chunk_decoder=mask_shfit, is_training=False)
        b = enc.shape[0]
        ys = jnp.full((b, 1), self.sos, jnp.int32)
        for _ in range(max_tokens):
            lens = jnp.full((b,), ys.shape[1], jnp.int32)
            logits, _ = decoder(params["decoder" + sfx], enc, enc_lens, ys,
                                lens, chunk_mask=scama_mask)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            ys = jnp.concatenate([ys, nxt[:, None]], axis=1)
        return np.asarray(ys[:, 1:]), np.asarray(token_num)

    def inference(self, params, data_in, data_lengths=None,
                  key: Optional[List] = None, tokenizer=None, frontend=None,
                  **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)
        meta: Dict = {}
        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs, audio_fs=kwargs.get("fs", 16000))
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)
        meta["batch_data_time"] = (float(np.sum(speech_lengths))
                                   * frontend.frame_shift_ms * frontend.lfr_n
                                   / 1000)
        speech = jnp.asarray(speech)
        speech_lengths = jnp.asarray(speech_lengths)
        mode = kwargs.get("decoding_model", "normal")  # fast | normal | offline
        ind = int(kwargs.get("decoding_ind", 0) or 0)
        if mode == "offline":
            ind = len(self.encoder.overlap_chunk_cls.chunk_size) - 1

        masks = self.encoder.overlap_chunk_cls.gen_chunk_mask(
            np.asarray(speech_lengths), ind)
        enc1, enc1_lens = self.encoder.forward_train_chunk(
            params["encoder"], speech, speech_lengths, masks)
        if mode == "fast":
            yseq, tok_num = self._decode_pass(params, enc1, enc1_lens, masks,
                                              ind, "1", tokenizer)
        else:
            enc1_rm = OverlapChunk.remove_chunk(enc1, enc1_lens, masks)
            enc1_rm = enc1_rm[:, : speech.shape[1]]
            fused = jnp.concatenate([speech.astype(enc1_rm.dtype), enc1_rm],
                                    axis=-1)
            strided, lens2 = self._stride_conv(params, fused, speech_lengths)
            masks2 = self.encoder2.overlap_chunk_cls.gen_chunk_mask(
                np.asarray(lens2), ind)
            enc2, enc2_lens = self.encoder2.forward_train_chunk(
                params["encoder2"], strided, lens2, masks2)
            yseq, tok_num = self._decode_pass(params, enc2, enc2_lens, masks2,
                                              ind, "2", tokenizer)

        if key is None:
            key = [f"rand_key_{i}" for i in range(yseq.shape[0])]
        results = []
        for i in range(yseq.shape[0]):
            token_int = [int(t) for t in yseq[i, : int(tok_num[i])]
                         if t not in (self.blank_id, self.sos, self.eos)]
            if tokenizer is not None:
                token = tokenizer.ids2tokens(token_int)
                text, _ = postprocess_utils.sentence_postprocess(token)
                results.append({"key": key[i], "text": text})
            else:
                results.append({"key": key[i], "token_int": token_int})
        return results, meta
