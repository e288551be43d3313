"""LCB-Net auxiliary encoders: text encoder, audio-text fusion, bias predictor.

TPU-native rebuilds of FunASR ``funasr/models/lcbnet/encoder.py``:
``TransformerTextEncoder:131`` (token ids -> embeddings -> transformer stack),
``FusionSANEncoder:244`` (SelfSrcAttention — self-attn + cross-attn + FFN layer
fusing OCR/slide text into the audio stream) and ``ConvBiasPredictor:373``
(ConvPredictor — cross-attention + FFN + depthwise conv -> per-token bias
probability). The LCBNet model itself lives in ``funasr_tpu/models/sa_asr``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    depthwise_conv1d_apply,
    depthwise_conv1d_init,
    embedding_apply,
    embedding_init,
    ffn_apply,
    ffn_init,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    make_pad_mask,
)
from funasr_tpu.models.transformer.attention import MHAConfig, mha_apply, mha_init
from funasr_tpu.models.transformer.encoder import TransformerEncoder
from funasr_tpu.register import tables


@tables.register("encoder_classes", "TransformerTextEncoder")
class TransformerTextEncoder:
    """Token ids -> (B, L, D) text memory (reference ``encoder.py:131``)."""

    def __init__(self, vocab_size: int = -1, input_size: int = -1,
                 output_size: int = 256, attention_heads: int = 4,
                 linear_units: int = 2048, num_blocks: int = 3, **kwargs):
        self.vocab_size = vocab_size if vocab_size > 0 else input_size
        kwargs.setdefault("input_layer", None)  # ids embed externally, no conv
        self.enc = TransformerEncoder(input_size=output_size,
                                      output_size=output_size,
                                      attention_heads=attention_heads,
                                      linear_units=linear_units,
                                      num_blocks=num_blocks, **kwargs)
        self._output_size = output_size

    def output_size(self):
        return self._output_size

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        return {"embed": embedding_init(k1, self.vocab_size, self._output_size),
                "encoder": self.enc.init(k2)}

    def __call__(self, params, text, text_lengths, rng=None):
        from funasr_tpu.models.transformer.attention import add_espnet_pe
        # reference embed = Embedding -> espnet PositionalEncoding (x*sqrt(d)+PE)
        x = add_espnet_pe(embedding_apply(params["embed"], text))
        return self.enc(params["encoder"], x, text_lengths, rng=rng)


@tables.register("encoder_classes", "FusionSANEncoder")
class SelfSrcAttention:
    """One audio<-text fusion block: self-attn + cross-attn + FFN
    (reference ``encoder.py:244``)."""

    def __init__(self, size: int = 256, attention_heads: int = 4,
                 attention_dim: int = 256, linear_units: int = 2048, **kwargs):
        self.cfg = MHAConfig(attention_heads, size)
        self.size = size
        self.linear_units = linear_units

    def output_size(self):
        return self.size

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        return {"norm1": layer_norm_init(self.size),
                "self_attn": mha_init(k1, self.cfg),
                "norm2": layer_norm_init(self.size),
                "src_attn": mha_init(k2, self.cfg),
                "norm3": layer_norm_init(self.size),
                "feed_forward": ffn_init(k3, self.size, self.linear_units)}

    def __call__(self, params, x, memory, memory_lengths=None):
        mem_mask = None
        if memory_lengths is not None:
            mem_mask = make_pad_mask(memory_lengths, memory.shape[1])[:, None, :]
        residual = x
        h = layer_norm_apply(params["norm1"], x)
        x = residual + mha_apply(params["self_attn"], self.cfg, h, h, h, None)
        residual = x
        h = layer_norm_apply(params["norm2"], x)
        x = residual + mha_apply(params["src_attn"], self.cfg, h, memory, memory,
                                 mem_mask)
        residual = x
        h = layer_norm_apply(params["norm3"], x)
        return residual + ffn_apply(params["feed_forward"], h)


@tables.register("encoder_classes", "ConvBiasPredictor")
class ConvPredictor:
    """Per-text-token bias score from (text memory, audio memory)
    (reference ``encoder.py:373``): cross-attn -> FFN -> depthwise conv with
    residual -> relu -> linear (raw logits, like the reference)."""

    def __init__(self, size: int = 256, l_order: int = 3, r_order: int = 3,
                 attention_heads: int = 4, linear_units: int = 2048, **kwargs):
        self.cfg = MHAConfig(attention_heads, size)
        self.size = size
        self.l_order, self.r_order = l_order, r_order
        self.linear_units = linear_units

    def init(self, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        return {"atten": mha_init(k1, self.cfg),
                "norm1": layer_norm_init(self.size),
                "feed_forward": ffn_init(k2, self.size, self.linear_units),
                "norm2": layer_norm_init(self.size),
                "conv1d": depthwise_conv1d_init(
                    k3, self.size, self.l_order + self.r_order + 1, bias=True),
                "output_linear": linear_init(k4, self.size, 1)}

    def __call__(self, params, text_enc, asr_enc):
        x = text_enc + mha_apply(params["atten"], self.cfg, text_enc, asr_enc,
                                 asr_enc, None)
        x = x + ffn_apply(params["feed_forward"],
                          layer_norm_apply(params["norm1"], x))
        h = layer_norm_apply(params["norm2"], x)
        mem = depthwise_conv1d_apply(params["conv1d"], h, left_pad=self.l_order,
                                     right_pad=self.r_order)
        h = jax.nn.relu(mem + h)
        return linear_apply(params["output_linear"], h)[..., 0]
