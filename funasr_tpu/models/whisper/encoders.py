"""Whisper-tower audio encoders registered under the reference's encoder names.

Two reference encoders are architecturally whisper encoder stacks, not espnet
transformers, so they get faithful implementations here instead of aliases:

- ``OpenAIWhisperEncoderWarp`` (reference ``funasr/models/whisper_lid/encoder.py:18``):
  wraps a whisper encoder verbatim — conv1(k3,s1)+GELU, conv2(k3,s2)+GELU,
  fixed sinusoid positions, pre-norm blocks, ln_post. Used as the audio tower
  of LID and LLM-ASR configs.
- ``QwenAudioEncoder`` (reference ``funasr/models/qwen_audio/audio.py:406``):
  the same tower plus AvgPool1d(2) time pooling, ln_post, a linear projection
  to the LLM width, and a 2-entry bos/eos embedding appended around each span.

Both consume (B, T, n_mels) log-mel features and respect padding by zeroing
padded frames and masking attention keys (reference ``audio.py:475-492``).
Weight converters live in ``funasr_tpu/convert/torch_to_jax.py``
(:func:`convert_whisper_tower`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import (
    conv1d_apply, conv1d_init, layer_norm_apply, layer_norm_init, linear_apply,
    linear_init, make_pad_mask)
from funasr_tpu.models.transformer.attention import MHAConfig, mha_apply
from funasr_tpu.models.whisper.model import SIZES, _enc_layer_init, _ffn, _sinusoids
from funasr_tpu.register import tables


class _TowerCfg:
    def __init__(self, n_mels, n_state, n_head, n_layer, n_ctx):
        self.n_mels, self.n_state = n_mels, n_state
        self.n_head, self.n_layer, self.n_ctx = n_head, n_layer, n_ctx

    @property
    def mha(self):
        return MHAConfig(self.n_head, self.n_state)

    # adapter so whisper's _enc_layer_init (keyed on WhisperConfig fields) works
    @property
    def d_model(self):
        return self.n_state

    @property
    def encoder_ffn_dim(self):
        return 4 * self.n_state


def _tower_init(rng, cfg: _TowerCfg):
    keys = jax.random.split(rng, cfg.n_layer + 3)
    return {
        "conv1": conv1d_init(keys[0], cfg.n_mels, cfg.n_state, 3),
        "conv2": conv1d_init(keys[1], cfg.n_state, cfg.n_state, 3),
        "layers": [_enc_layer_init(keys[2 + i], cfg) for i in range(cfg.n_layer)],
        "ln_post": layer_norm_init(cfg.n_state),
    }


def _tower_apply(params, cfg: _TowerCfg, mel, ilens, *, final_norm=True):
    """mel (B, T, n_mels), ilens in mel frames -> ((B, T//2, n_state), olens).

    Padded key positions are masked out of attention and padded frames zeroed,
    matching the reference's key_padding_mask handling (audio.py:475-492)."""
    h = jax.nn.gelu(conv1d_apply(params["conv1"], mel, left_pad=1, right_pad=1),
                    approximate=False)
    h = jax.nn.gelu(conv1d_apply(params["conv2"], h, left_pad=1, right_pad=1,
                                 stride=2), approximate=False)
    t = h.shape[1]
    pos = jnp.asarray(_sinusoids(max(t, cfg.n_ctx), cfg.n_state))[:t]
    h = h + pos.astype(h.dtype)
    olens = None
    mask = None
    if ilens is not None:
        olens = (ilens + 1) // 2
        mask = make_pad_mask(olens, t)            # (B, T') True=valid
        h = jnp.where(mask[..., None], h, 0.0)
        mask = mask[:, None, :]                   # key mask for attention
    for lp in params["layers"]:
        res = h
        x = layer_norm_apply(lp["self_attn_layer_norm"], h)
        h = res + mha_apply(lp["self_attn"], cfg.mha, x, x, x, mask)
        res = h
        x = layer_norm_apply(lp["final_layer_norm"], h)
        h = res + _ffn(lp, x)
    if final_norm:
        h = layer_norm_apply(params["ln_post"], h)
    return h, olens


@tables.register("encoder_classes", "OpenAIWhisperEncoderWarp")
class OpenAIWhisperEncoderWarp:
    """Whisper encoder as a registry encoder (reference whisper_lid/encoder.py:18).

    ``whisper_model`` selects the OpenAI size ("small", "large-v3", ...); dims
    can also be given explicitly (n_mels/n_state/n_head/n_layer)."""

    def __init__(self, whisper_model: str = "small", n_mels: int | None = None,
                 n_state: int | None = None, n_head: int | None = None,
                 n_layer: int | None = None, n_ctx: int = 1500, **kwargs):
        size = whisper_model if whisper_model.startswith("whisper-") \
            else f"whisper-{whisper_model}"
        conf = dict(d_model=1280, encoder_layers=32, encoder_attention_heads=20,
                    num_mel_bins=128)
        conf.update(SIZES.get(size, {}))
        self.cfg = _TowerCfg(
            n_mels or conf.get("num_mel_bins", 80),
            n_state or conf["d_model"],
            n_head or conf["encoder_attention_heads"],
            n_layer or conf["encoder_layers"],
            n_ctx)

    def output_size(self):
        return self.cfg.n_state

    def output_len(self, ilens):
        return (ilens + 1) // 2

    def init(self, rng):
        return _tower_init(rng, self.cfg)

    def __call__(self, params, xs_pad, ilens, rng=None):
        return _tower_apply(params, self.cfg, xs_pad, ilens)


@tables.register("encoder_classes", "QwenAudioEncoder")
class QwenAudioEncoder:
    """Qwen-Audio tower (reference qwen_audio/audio.py:406): whisper encoder +
    AvgPool1d(2) + ln_post + proj to the LLM width; optional bos/eos span
    embeddings surfaced via :meth:`bos_eos`."""

    def __init__(self, n_mels: int = 80, n_ctx: int = 1500, n_state: int = 1280,
                 n_head: int = 20, n_layer: int = 32, output_dim: int = 4096,
                 avg_pool: bool = True, add_audio_bos_eos_token: bool = True,
                 **kwargs):
        self.cfg = _TowerCfg(n_mels, n_state, n_head, n_layer, n_ctx)
        self.out_dim = output_dim
        self.avg_pool = avg_pool
        self.add_bos_eos = add_audio_bos_eos_token

    def output_size(self):
        return self.out_dim

    def output_len(self, ilens):
        n = (ilens + 1) // 2
        return n // 2 if self.avg_pool else n

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        p = _tower_init(k1, self.cfg)
        p["proj"] = linear_init(k2, self.cfg.n_state, self.out_dim)
        if self.add_bos_eos:
            p["audio_bos_eos_token"] = (
                jax.random.normal(k3, (2, self.out_dim)) * 0.02)
        return p

    def bos_eos(self, params):
        if not self.add_bos_eos:
            return None, None
        w = params["audio_bos_eos_token"]
        return w[0], w[1]

    def __call__(self, params, xs_pad, ilens, rng=None):
        # reference applies ln_post AFTER pooling (audio.py:495-501)
        h, olens = _tower_apply(params, self.cfg, xs_pad, ilens, final_norm=False)
        if self.avg_pool:
            t2 = (h.shape[1] // 2) * 2
            h = h[:, :t2].reshape(h.shape[0], t2 // 2, 2, -1).mean(axis=2)
            olens = None if olens is None else olens // 2
        h = layer_norm_apply(params["ln_post"], h)
        h = linear_apply(params["proj"], h)
        return h, olens
