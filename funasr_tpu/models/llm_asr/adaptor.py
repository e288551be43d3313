"""Audio->LLM adaptors (counterpart of FunASR ``funasr/models/llm_asr/adaptor.py``:
Linear ``:10`` — stack k frames then MLP to llm_dim; Transformer ``:126`` adds
self-attention blocks; QFormer ``:49``)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import linear_apply, linear_init
from funasr_tpu.register import tables


@tables.register("adaptor_classes", "Linear")
class LinearAdaptor:
    def __init__(self, downsample_rate: int = 2, encoder_dim: int = 512,
                 llm_dim: int = 1024, ffn_dim: int = 2048, **kwargs):
        self.k = downsample_rate
        self.encoder_dim = encoder_dim
        self.llm_dim = llm_dim
        self.ffn_dim = ffn_dim

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        return {"linear1": linear_init(k1, self.encoder_dim * self.k, self.ffn_dim),
                "linear2": linear_init(k2, self.ffn_dim, self.llm_dim)}

    def audio_token_len(self, fbank_len: int) -> int:
        """LLM token slots one audio span occupies (placeholder count the
        multiturn datasets/data_load_speech must reserve — reference
        ``llm_asr/model.py:778-786`` sub_token_len math)."""
        return max(int(fbank_len) // self.k, 1)

    def __call__(self, params, x, lengths=None):
        """x: (B, T, enc) -> (B, T//k, llm_dim); trailing frames dropped."""
        b, t, d = x.shape
        t_keep = (t // self.k) * self.k
        x = x[:, :t_keep].reshape(b, t_keep // self.k, d * self.k)
        h = jax.nn.relu(linear_apply(params["linear1"], x))
        out = linear_apply(params["linear2"], h)
        out_lens = lengths // self.k if lengths is not None else None
        return out, out_lens


@tables.register("adaptor_classes", "Transformer")
class TransformerAdaptor(LinearAdaptor):
    """Linear adaptor + n_layer post-MHSA blocks (reference ``adaptor.py:126``)."""

    def __init__(self, *args, n_layer: int = 2, attention_heads: int = 8, **kwargs):
        super().__init__(*args, **kwargs)
        self.n_layer = n_layer
        self.attention_heads = attention_heads

    def init(self, rng):
        from funasr_tpu.models.transformer.encoder import (
            TransformerEncoderConfig, _layer_init)
        params = super().init(rng)
        cfg = TransformerEncoderConfig(self.llm_dim, self.llm_dim,
                                       self.attention_heads, self.ffn_dim,
                                       self.n_layer)
        params["blocks"] = [
            _layer_init(jax.random.fold_in(rng, 100 + i), cfg)
            for i in range(self.n_layer)]
        return params

    def __call__(self, params, x, lengths=None):
        from funasr_tpu.core.layers import make_pad_mask
        from funasr_tpu.models.transformer.encoder import (
            TransformerEncoderConfig, _layer_apply)
        out, out_lens = super().__call__(params, x, lengths)
        cfg = TransformerEncoderConfig(self.llm_dim, self.llm_dim,
                                       self.attention_heads, self.ffn_dim,
                                       self.n_layer)
        mask = make_pad_mask(
            out_lens if out_lens is not None
            else jnp.full((out.shape[0],), out.shape[1]), out.shape[1])
        for lp in params["blocks"]:
            out = _layer_apply(lp, cfg, out, mask)
        return out, out_lens


@tables.register("adaptor_classes", "QFormer")
class QFormerAdaptor:
    """BLIP2-style query former (reference ``adaptor.py:49``
    EncoderProjectorQFormer): a fixed bank of learned query tokens cross-attends
    to the encoder sequence through n_layer (self-attn + cross-attn + FFN)
    blocks, then projects to llm_dim. Output length is the static query count —
    attractive for the LLM engine because every utterance yields the same
    number of audio tokens."""

    def __init__(self, encoder_dim: int = 512, llm_dim: int = 1024,
                 query_tokens: int = 64, n_layer: int = 2,
                 attention_heads: int = 8, ffn_dim: int = 2048, **kwargs):
        self.encoder_dim = encoder_dim
        self.llm_dim = llm_dim
        self.n_query = query_tokens
        self.n_layer = n_layer
        self.heads = attention_heads
        self.ffn_dim = ffn_dim

    def init(self, rng):
        from funasr_tpu.models.transformer.attention import MHAConfig, mha_init
        from funasr_tpu.core.layers import layer_norm_init, ffn_init
        d = self.encoder_dim
        cfg = MHAConfig(self.heads, d)
        keys = jax.random.split(rng, self.n_layer + 2)
        layers = []
        for i in range(self.n_layer):
            ks = jax.random.split(keys[i], 3)
            layers.append({
                "norm1": layer_norm_init(d), "self_attn": mha_init(ks[0], cfg),
                "norm2": layer_norm_init(d), "cross_attn": mha_init(ks[1], cfg),
                "norm3": layer_norm_init(d), "ffn": ffn_init(ks[2], d, self.ffn_dim),
            })
        return {
            "queries": jax.random.normal(keys[-2], (self.n_query, d)) * 0.02,
            "layers": layers,
            "proj": linear_init(keys[-1], d, self.llm_dim),
        }

    def audio_token_len(self, fbank_len: int) -> int:
        return self.n_query

    def __call__(self, params, x, lengths=None):
        from funasr_tpu.core.layers import (layer_norm_apply, ffn_apply,
                                            make_pad_mask)
        from funasr_tpu.models.transformer.attention import MHAConfig, mha_apply
        cfg = MHAConfig(self.heads, self.encoder_dim)
        b = x.shape[0]
        q = jnp.tile(params["queries"][None], (b, 1, 1)).astype(x.dtype)
        mem_mask = None
        if lengths is not None:
            mem_mask = make_pad_mask(lengths, x.shape[1])[:, None, :]
        for lp in params["layers"]:
            h = layer_norm_apply(lp["norm1"], q)
            q = q + mha_apply(lp["self_attn"], cfg, h, h, h, None)
            h = layer_norm_apply(lp["norm2"], q)
            q = q + mha_apply(lp["cross_attn"], cfg, h, x, x, mem_mask)
            h = layer_norm_apply(lp["norm3"], q)
            q = q + ffn_apply(lp["ffn"], h)
        out = linear_apply(params["proj"], q)
        out_lens = jnp.full((b,), self.n_query, jnp.int32)
        return out, out_lens
