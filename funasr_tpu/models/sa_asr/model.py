"""SA-ASR: speaker-attributed ASR — joint "who spoke what".

TPU-native rebuild of FunASR ``funasr/models/sa_asr/model.py`` lineage: an ASR branch
(SAN-M encoder -> CIF -> NAR decoder) plus a speaker branch that attends each decoded
token's hidden state over a bank of candidate speaker profiles, emitting a speaker id
per token. Output: {"text", "spk_ids" (per token), "sentence_info"}.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import linear_apply, linear_init, make_pad_mask
from funasr_tpu.losses.label_smoothing_loss import label_smoothing_loss
from funasr_tpu.models.paraformer.model import Paraformer, add_sos_eos_out
from funasr_tpu.models.sanm.attention import (
    CrossAttentionConfig, cross_attention_apply, cross_attention_init)
from funasr_tpu.register import tables
from funasr_tpu.utils import postprocess_utils


@tables.register("model_classes", "SAASR")
@tables.register("model_classes", "SAAsr")
class SAASR(Paraformer):
    def __init__(self, *args, spk_embed_dim: int = 192, max_spk_num: int = 16,
                 spk_weight: float = 0.5, spk_attention_heads: int = 4, **kwargs):
        super().__init__(*args, **kwargs)
        self.spk_embed_dim = spk_embed_dim
        self.max_spk_num = max_spk_num
        self.spk_weight = spk_weight
        enc_out = self.encoder.output_size()
        self.spk_cross_cfg = CrossAttentionConfig(spk_attention_heads, enc_out,
                                                  enc_out)

    def init_params(self, rng):
        params = super().init_params(rng)
        k1, k2, k3 = jax.random.split(jax.random.fold_in(rng, 55), 3)
        params["spk_proj"] = linear_init(k1, self.spk_embed_dim,
                                         self.encoder.output_size())
        params["spk_attn"] = cross_attention_init(k2, self.spk_cross_cfg)
        params["spk_norm_w"] = jnp.asarray(1.0)
        return params

    def _spk_logits(self, params, decoder_hidden, profiles):
        """decoder_hidden (B, L, D), profiles (B, S, E) -> (B, L, S) logits."""
        prof = linear_apply(params["spk_proj"], profiles)
        s = prof.shape[1]
        mask = jnp.ones((decoder_hidden.shape[0], s), bool)
        attended, attn = cross_attention_apply(
            params["spk_attn"], self.spk_cross_cfg, decoder_hidden, prof, mask,
            ret_attn=True)
        # head-averaged attention over profiles as speaker posterior
        return jnp.log(jnp.mean(attn.astype(jnp.float32), axis=1) + 1e-9)

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths,
                    rng=None, profiles=None, spk_labels=None, profile=None,
                    profile_lengths=None, text_id=None, text_id_lengths=None):
        # accept the reference batch-field names (e2e_sa_asr.py:162-171)
        profiles = profiles if profiles is not None else profile
        spk_labels = spk_labels if spk_labels is not None else text_id
        loss, stats, weight = super().forward_jit(params, speech, speech_lengths,
                                                  text, text_lengths, rng)
        if profiles is None or spk_labels is None:
            return loss, stats, weight
        encoder_out, encoder_out_lens = self.encode(params, speech, speech_lengths)
        ys = add_sos_eos_out(text, text_lengths, self.eos, self.ignore_id) \
            if self.predictor_bias == 1 else text
        ys_lens = text_lengths + self.predictor_bias
        mask = make_pad_mask(encoder_out_lens, encoder_out.shape[1])
        embeds, _, _, _ = self.predictor(params["predictor"], encoder_out, mask,
                                         ys.shape[1], target_length=ys_lens)
        hidden, _ = self.decoder(params["decoder"], encoder_out, encoder_out_lens,
                                 embeds, ys_lens, return_hidden=True)
        spk_logits = self._spk_logits(params, hidden, profiles)
        loss_spk = label_smoothing_loss(spk_logits, spk_labels, self.ignore_id,
                                        0.0, spk_logits.shape[-1])
        loss = loss + self.spk_weight * loss_spk
        stats = dict(stats)
        stats.update(loss_spk=loss_spk, loss=loss)
        return loss, stats, weight

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, profiles=None, **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)

        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs, audio_fs=kwargs.get("fs", 16000))
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)
        speech = jnp.asarray(speech)
        speech_lengths = jnp.asarray(speech_lengths)
        encoder_out, encoder_out_lens = self.encode(params, speech, speech_lengths)
        embeds, tok_num, _, _ = self.calc_predictor(params, encoder_out,
                                                    encoder_out_lens)
        tok_lens = jnp.clip(jnp.round(tok_num).astype(jnp.int32), 0,
                            embeds.shape[1])
        logits, _ = self.decoder(params["decoder"], encoder_out, encoder_out_lens,
                                 embeds, tok_lens)
        hidden, _ = self.decoder(params["decoder"], encoder_out, encoder_out_lens,
                                 embeds, tok_lens, return_hidden=True)
        yseq = np.asarray(jnp.argmax(logits, -1))
        tok_lens_np = np.asarray(tok_lens)
        spk_ids = None
        if profiles is not None:
            spk_logits = self._spk_logits(params, hidden, jnp.asarray(profiles))
            spk_ids = np.asarray(jnp.argmax(spk_logits, -1))

        results = []
        if key is None:
            key = [f"rand_key_{i}" for i in range(yseq.shape[0])]
        for i in range(yseq.shape[0]):
            ids, spks = [], []
            for j in range(tok_lens_np[i]):
                tok = int(yseq[i, j])
                if tok in (self.blank_id, self.sos, self.eos):
                    continue
                ids.append(tok)
                if spk_ids is not None:
                    spks.append(int(spk_ids[i, j]))
            if tokenizer is not None:
                token = tokenizer.ids2tokens(ids)
                text, _ = postprocess_utils.sentence_postprocess(token)
            else:
                text = ids
            result = {"key": key[i], "text": text}
            if spk_ids is not None:
                result["spk_ids"] = spks
            results.append(result)
        return results, {}


@tables.register("model_classes", "LCBNetNAR")
class LCBNet(Paraformer):
    """NAR variant of long-context biasing (our own design, kept alongside the
    reference-faithful AED ``funasr_tpu/models/lcbnet/model.py`` LCBNet): bias
    text tokens encode through a transformer and the decoder hidden states fuse
    with them via cross-attention before the output layer."""

    def __init__(self, *args, bias_encoder_blocks: int = 2,
                 bias_attention_heads: int = 4, **kwargs):
        super().__init__(*args, **kwargs)
        from funasr_tpu.models.transformer.encoder import TransformerEncoder
        enc_out = self.encoder.output_size()
        self.bias_text_encoder = TransformerEncoder(
            input_size=enc_out, output_size=enc_out,
            attention_heads=bias_attention_heads, linear_units=enc_out * 4,
            num_blocks=bias_encoder_blocks, input_layer=None)
        self.bias_cross_cfg = CrossAttentionConfig(bias_attention_heads, enc_out,
                                                   enc_out)

    def init_params(self, rng):
        params = super().init_params(rng)
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 66))
        params["bias_text_encoder"] = self.bias_text_encoder.init(k1)
        params["bias_attn"] = cross_attention_init(k2, self.bias_cross_cfg)
        return params

    def bias_fuse(self, params, hidden, bias_ids):
        emb = self.decoder.embed(params["decoder"], bias_ids, dtype=hidden.dtype)
        enc, _ = self.bias_text_encoder(
            params["bias_text_encoder"], emb,
            jnp.full((emb.shape[0],), emb.shape[1], jnp.int32))
        mask = jnp.ones((hidden.shape[0], enc.shape[1]), bool)
        return hidden + cross_attention_apply(params["bias_attn"],
                                              self.bias_cross_cfg, hidden, enc,
                                              mask)

    def inference(self, params, data_in, data_lengths=None, key=None,
                  tokenizer=None, frontend=None, ocr_text=None, **kwargs):
        from funasr_tpu.core.layers import linear_apply as _lin
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)

        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs, audio_fs=kwargs.get("fs", 16000))
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend)
        speech = jnp.asarray(speech)
        speech_lengths = jnp.asarray(speech_lengths)
        encoder_out, encoder_out_lens = self.encode(params, speech, speech_lengths)
        embeds, tok_num, _, _ = self.calc_predictor(params, encoder_out,
                                                    encoder_out_lens)
        tok_lens = jnp.clip(jnp.round(tok_num).astype(jnp.int32), 0, embeds.shape[1])
        hidden, _ = self.decoder(params["decoder"], encoder_out, encoder_out_lens,
                                 embeds, tok_lens, return_hidden=True)
        if ocr_text and tokenizer is not None:
            bias_ids = jnp.asarray([tokenizer.encode(ocr_text)], jnp.int32)
            bias_ids = jnp.tile(bias_ids, (hidden.shape[0], 1))
            hidden = self.bias_fuse(params, hidden, bias_ids)
        logits = _lin(params["decoder"]["output_layer"], hidden)
        yseq = np.asarray(jnp.argmax(logits, -1))
        tok_lens_np = np.asarray(tok_lens)
        results = []
        if key is None:
            key = [f"rand_key_{i}" for i in range(yseq.shape[0])]
        for i in range(yseq.shape[0]):
            ids = [int(t) for t in yseq[i, : tok_lens_np[i]]
                   if t not in (self.blank_id, self.sos, self.eos)]
            if tokenizer is not None:
                token = tokenizer.ids2tokens(ids)
                text, _ = postprocess_utils.sentence_postprocess(token)
                results.append({"key": key[i], "text": text})
            else:
                results.append({"key": key[i], "token_int": ids})
        return results, {}
