"""Transformer language model for shallow fusion in beam search.

Counterpart of FunASR ``funasr/models/language_model/transformer_lm.py:14``:
embed + PE -> causal transformer encoder -> vocab head; scoring interface
``score_step(params, ys, ys_len)`` matching the decoder scorer used by
``funasr_tpu.models.transformer.search``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    embedding_apply, embedding_init, layer_norm_apply, layer_norm_init,
    linear_apply, linear_init, make_pad_mask)
from funasr_tpu.core.module import stack_params
from funasr_tpu.models.transformer.attention import add_espnet_pe
from funasr_tpu.models.transformer.encoder import (
    TransformerEncoderConfig, _layer_apply, _layer_init)
from funasr_tpu.register import tables


@tables.register("model_classes", "TransformerLM")
class TransformerLM:
    def __init__(self, vocab_size: int, embed_unit: int = 128, att_unit: int = 256,
                 head: int = 2, unit: int = 1024, layer: int = 4, **kwargs):
        self.vocab_size = vocab_size
        self.embed_unit = embed_unit
        self.cfg = TransformerEncoderConfig(embed_unit, att_unit, head, unit, layer,
                                            input_layer="linear")

    def init_params(self, rng):
        keys = jax.random.split(rng, self.cfg.num_blocks + 4)
        return {
            "embed": embedding_init(keys[0], self.vocab_size, self.embed_unit),
            "input_proj": linear_init(keys[1], self.embed_unit,
                                      self.cfg.output_size),
            "encoders": stack_params([
                _layer_init(keys[2 + i], self.cfg)
                for i in range(self.cfg.num_blocks)]),
            "after_norm": layer_norm_init(self.cfg.output_size),
            "decoder": linear_init(keys[-1], self.cfg.output_size, self.vocab_size),
        }

    def _run(self, params, ys, ys_len):
        l = ys.shape[1]
        x = embedding_apply(params["embed"], ys)
        x = add_espnet_pe(linear_apply(params["input_proj"], x))
        causal = jnp.tril(jnp.ones((l, l), bool))
        pad = make_pad_mask(ys_len, l)
        mask2d = causal[None] & pad[:, None, :]

        def body(carry, lp):
            # _layer_apply expects (B, T) mask; adapt with full 3D mask via mha
            from funasr_tpu.models.transformer.attention import mha_apply
            residual = carry
            h = layer_norm_apply(lp["norm1"], carry)
            h = mha_apply(lp["self_attn"], self.cfg.mha, h, h, h, mask2d)
            x = residual + h
            residual = x
            h = layer_norm_apply(lp["norm2"], x)
            from funasr_tpu.core.layers import ffn_apply
            return residual + ffn_apply(lp["feed_forward"], h), None

        x, _ = jax.lax.scan(body, x, params["encoders"])
        x = layer_norm_apply(params["after_norm"], x)
        return linear_apply(params["decoder"], x)

    def forward_jit(self, params, text, text_lengths, rng=None, **kwargs):
        """LM training: next-token CE over the sequence."""
        ys_in = text[:, :-1]
        ys_out = text[:, 1:]
        logits = self._run(params, ys_in, text_lengths - 1)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        valid = (jnp.arange(ys_out.shape[1])[None] < (text_lengths - 1)[:, None])
        tgt = jnp.where(valid, ys_out, 0)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0] * valid
        ntok = jnp.maximum(jnp.sum(valid), 1)
        loss = jnp.sum(nll) / ntok
        return loss, {"loss": loss, "ppl": jnp.exp(loss)}, ntok

    def score_step(self, params, ys, ys_len, *unused):
        """(N, L) prefixes -> (N, V) next-token log-probs (beam-search scorer)."""
        logits = self._run(params, ys, ys_len)
        last = jnp.take_along_axis(
            logits, (ys_len - 1)[:, None, None].repeat(logits.shape[-1], -1),
            axis=1)[:, 0]
        return jax.nn.log_softmax(last.astype(jnp.float32), -1)


@tables.register("model_classes", "SeqRNNLM")
class SeqRNNLM:
    """LSTM language model (reference ``seq_rnn_lm.py:11``)."""

    def __init__(self, vocab_size: int, embed_unit: int = 256, hidden_size: int = 512,
                 num_layers: int = 2, **kwargs):
        self.vocab_size = vocab_size
        self.embed_unit = embed_unit
        self.hidden = hidden_size
        self.num_layers = num_layers

    def init_params(self, rng):
        from funasr_tpu.core.layers import lstm_init
        keys = jax.random.split(rng, self.num_layers + 2)
        return {
            "embed": embedding_init(keys[0], self.vocab_size, self.embed_unit),
            "lstm": [lstm_init(keys[1 + i],
                               self.embed_unit if i == 0 else self.hidden,
                               self.hidden) for i in range(self.num_layers)],
            "decoder": linear_init(keys[-1], self.hidden, self.vocab_size),
        }

    def _run(self, params, ys):
        from funasr_tpu.core.layers import lstm_apply
        x = embedding_apply(params["embed"], ys)
        for lp in params["lstm"]:
            x = lstm_apply(lp, x)
        return linear_apply(params["decoder"], x)

    def forward_jit(self, params, text, text_lengths, rng=None, **kwargs):
        logits = self._run(params, text[:, :-1])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        ys_out = text[:, 1:]
        valid = (jnp.arange(ys_out.shape[1])[None] < (text_lengths - 1)[:, None])
        tgt = jnp.where(valid, ys_out, 0)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0] * valid
        ntok = jnp.maximum(jnp.sum(valid), 1)
        loss = jnp.sum(nll) / ntok
        return loss, {"loss": loss, "ppl": jnp.exp(loss)}, ntok

    def score_step(self, params, ys, ys_len, *unused):
        logits = self._run(params, ys)
        last = jnp.take_along_axis(
            logits, (ys_len - 1)[:, None, None].repeat(logits.shape[-1], -1),
            axis=1)[:, 0]
        return jax.nn.log_softmax(last.astype(jnp.float32), -1)
