"""ContextualParaformer: CLAS-style hotword biasing (the older hotword variant).

TPU-native rebuild of FunASR ``funasr/models/contextual_paraformer/model.py:45`` +
``decoder.py``: hotword embeds from bias_embed + 1-layer LSTM (last hidden per word);
the decoder's last attention layer exposes its self-attn output, a ContextualBias
cross-attention attends it to the hotword memory, and ``bias_output`` (conv1d over
[src_attn || clas_scale * bias]) merges back before the tail layers.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.core.layers import (
    conv1d_apply, conv1d_init, embedding_apply, embedding_init,
    ffn_dec_sanm_apply, layer_norm_apply, layer_norm_init, linear_apply,
    lstm_apply, lstm_init, make_pad_mask)
from funasr_tpu.core.module import unstack_params
from funasr_tpu.models.paraformer.decoder import (
    ParaformerDecoderConfig, ParaformerSANMDecoder, _layer_apply)
from funasr_tpu.models.paraformer.model import Paraformer
from funasr_tpu.models.sanm.attention import (
    cross_attention_apply, cross_attention_init, fsmn_decoder_apply)
from funasr_tpu.register import tables
from funasr_tpu.utils import postprocess_utils


@tables.register("decoder_classes", "ContextualParaformerDecoder")
class ContextualParaformerDecoder(ParaformerSANMDecoder):
    def init(self, rng):
        params = super().init(rng)
        cfg = self.cfg
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 21))
        params["bias_decoder"] = {
            "norm3": layer_norm_init(cfg.dim),
            "src_attn": cross_attention_init(k1, cfg.cross_cfg),
        }
        params["bias_output"] = conv1d_init(k2, cfg.dim * 2, cfg.dim, 1, bias=False)
        return params

    def __call__(self, params, hs_pad, hlens, ys_in_pad, ys_in_lens,
                 contextual_info=None, clas_scale: float = 1.0,
                 return_hidden: bool = False):
        if contextual_info is None:
            return super().__call__(params, hs_pad, hlens, ys_in_pad, ys_in_lens,
                                    return_hidden=return_hidden)
        cfg = self.cfg
        tgt_mask = make_pad_mask(ys_in_lens, ys_in_pad.shape[1])
        memory_mask = make_pad_mask(hlens, hs_pad.shape[1])

        layers = unstack_params(params["decoders"], cfg.att_layer_num)
        x = ys_in_pad
        for lp in layers[:-1]:
            x = _layer_apply(lp, cfg, x, tgt_mask, hs_pad, memory_mask, True, True)

        # last layer exposes self-attn and src-attn branches separately
        lp = layers[-1]
        residual = x
        h = layer_norm_apply(lp["norm1"], x)
        h = ffn_dec_sanm_apply(lp["feed_forward"], h)
        h2 = layer_norm_apply(lp["norm2"], h)
        h2 = fsmn_decoder_apply(lp["self_attn"], cfg.fsmn_cfg, h2, tgt_mask)
        x_self_attn = residual + h2
        h3 = layer_norm_apply(lp["norm3"], x_self_attn)
        x_src_attn = cross_attention_apply(lp["src_attn"], cfg.cross_cfg, h3,
                                           hs_pad, memory_mask)

        # bias attention over hotword memory
        bp = params["bias_decoder"]
        ctx_mask = jnp.ones((hs_pad.shape[0], contextual_info.shape[1]), bool)
        cx = cross_attention_apply(
            bp["src_attn"], cfg.cross_cfg,
            layer_norm_apply(bp["norm3"], x_self_attn), contextual_info, ctx_mask)

        merged = jnp.concatenate([x_src_attn, cx * clas_scale], axis=-1)
        merged = conv1d_apply(params["bias_output"], merged)
        x = x_self_attn + merged

        if "decoders2" in params:
            for lp2 in unstack_params(params["decoders2"],
                                      cfg.num_blocks - cfg.att_layer_num):
                x = _layer_apply(lp2, cfg, x, tgt_mask, None, None, True, False)
        x = _layer_apply(params["decoders3"], cfg, x, tgt_mask, None, None,
                         False, False)
        hidden = layer_norm_apply(params["after_norm"], x)
        if cfg.use_output_layer and not return_hidden:
            return linear_apply(params["output_layer"], hidden), ys_in_lens
        return hidden, ys_in_lens


@tables.register("model_classes", "ContextualParaformer")
class ContextualParaformer(Paraformer):
    def __init__(self, *args, decoder: str = "ContextualParaformerDecoder", **kwargs):
        super().__init__(*args, decoder=decoder, **kwargs)
        self.inner_dim = kwargs.get("inner_dim", 256)
        self.use_decoder_embedding = kwargs.get("use_decoder_embedding", False)

    def init_params(self, rng):
        params = super().init_params(rng)
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 31))
        params["bias_embed"] = embedding_init(k1, self.vocab_size, self.inner_dim)
        params["bias_encoder"] = lstm_init(k2, self.inner_dim, self.inner_dim)
        return params

    def _hotword_repr(self, params, hw_pad, hw_lengths):
        if self.use_decoder_embedding:
            emb = self.decoder.embed(params["decoder"], hw_pad)
        else:
            emb = embedding_apply(params["bias_embed"], hw_pad)
        h = lstm_apply(params["bias_encoder"], emb)
        idx = jnp.maximum(hw_lengths - 1, 0)
        return jnp.take_along_axis(h, idx[:, None, None].repeat(h.shape[-1], -1),
                                   axis=1)[:, 0]

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, **kwargs):
        from funasr_tpu.utils.load_utils import (extract_fbank,
                                                 load_audio_text_image_video)

        meta: Dict = {}
        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs, audio_fs=kwargs.get("fs", 16000),
            data_type=kwargs.get("data_type", "sound"))
        speech, speech_lengths = extract_fbank(audio_list, frontend=frontend,
                                               device=True)
        meta["batch_data_time"] = (float(np.sum(speech_lengths))
                                   * frontend.frame_shift_ms * frontend.lfr_n / 1000)

        hotword = kwargs.get("hotword")
        contextual_info = None
        if hotword and tokenizer is not None:
            words = hotword.split() if isinstance(hotword, str) else list(hotword)
            hw_lists = [tokenizer.encode(w) for w in words] + [[self.sos]]
            maxlen = max(len(h) for h in hw_lists)
            hw_pad = np.zeros((len(hw_lists), maxlen), np.int32)
            lens = np.zeros((len(hw_lists),), np.int32)
            for i, h in enumerate(hw_lists):
                hw_pad[i, : len(h)] = h
                lens[i] = len(h)
            selected = self._hotword_repr(params, jnp.asarray(hw_pad),
                                          jnp.asarray(lens))
            contextual_info = jnp.tile(selected[None], (speech.shape[0], 1, 1))

        # jit-cached, bucketed encoder+CIF front half; the contextual decode
        # stays eager (hotword memory shape varies per call)
        (encoder_out, encoder_out_lens, pre_acoustic_embeds, token_lens,
         alphas, peaks, b_real) = self.encode_predict_bucketed(
            params, speech, speech_lengths)
        if contextual_info is not None and contextual_info.shape[0] != encoder_out.shape[0]:
            contextual_info = jnp.tile(contextual_info[:1],
                                       (encoder_out.shape[0], 1, 1))
        logits, _ = self.decoder(params["decoder"], encoder_out, encoder_out_lens,
                                 pre_acoustic_embeds, token_lens,
                                 contextual_info=contextual_info,
                                 clas_scale=kwargs.get("clas_scale", 1.0))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        k = pre_acoustic_embeds.shape[1]
        tok_valid = make_pad_mask(token_lens, k)
        yseq = np.asarray(jnp.where(tok_valid, jnp.argmax(logp, -1), self.blank_id))
        token_lens_np = np.asarray(token_lens)

        results = []
        b = b_real
        if key is None:
            key = [f"rand_key_{i}" for i in range(b)]
        for i in range(b):
            token_int = [int(t) for t in yseq[i, : token_lens_np[i]]
                         if t not in (self.blank_id, self.sos, self.eos)]
            if tokenizer is not None:
                token = tokenizer.ids2tokens(token_int)
                text, _ = postprocess_utils.sentence_postprocess(token)
                results.append({"key": key[i], "text": text})
            else:
                results.append({"key": key[i], "token_int": token_int})
        return results, meta
