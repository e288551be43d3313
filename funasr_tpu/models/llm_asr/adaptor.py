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
