"""Whisper ASR in JAX (counterpart of FunASR ``funasr/models/whisper/model.py:20-190``
which wraps openai-whisper; here the full encoder-decoder runs natively).

Architecture (HF/OpenAI whisper): encoder = conv1d(k3,s1)+GELU, conv1d(k3,s2)+GELU,
fixed sinusoidal positions, pre-norm transformer; decoder = token + learned position
embeds, causal self-attn + cross-attn, tied lm head. Converter accepts HF
WhisperForConditionalGeneration state dicts.
"""

from __future__ import annotations

import math
import time
from functools import partial
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


from funasr_tpu.core.layers import (
    layer_norm_apply, layer_norm_init, linear_apply, linear_init,
    make_pad_mask, masked_softmax)
from funasr_tpu.models.transformer.attention import MHAConfig, mha_apply, mha_init
from funasr_tpu.register import tables


@partial(jax.jit, static_argnames=("self",))
def _whisper_next_token_jit(self, params, tokens, encoder_out, last_pos):
    """One greedy step via full-prefix recompute (fallback / parity oracle):
    one program + one host round-trip per token, but a fresh compile per
    prefix-length bucket."""
    logits = self.decode_logits(params, tokens, encoder_out)
    row = jnp.take_along_axis(
        logits, last_pos[:, None, None].repeat(logits.shape[-1], -1),
        axis=1)[:, 0]
    return jnp.argmax(row, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("self",))
def _whisper_cross_kv_jit(self, params, encoder_out):
    """Per-layer cross-attention k/v, computed once per utterance."""
    cfg = self.cfg
    mha = MHAConfig(cfg.decoder_attention_heads, cfg.d_model)

    def heads(y):
        b, t, _ = y.shape
        return y.reshape(b, t, mha.n_head, mha.d_k).transpose(0, 2, 1, 3)

    out = []
    for lp in params["decoder"]["layers"]:
        out.append({
            "k": heads(linear_apply(lp["encoder_attn"]["linear_k"],
                                    encoder_out)),
            "v": heads(linear_apply(lp["encoder_attn"]["linear_v"],
                                    encoder_out))})
    return out


@partial(jax.jit, static_argnames=("self",), donate_argnums=(3,))
def _whisper_cached_step_jit(self, params, toks, self_kv, cross_kv, pos):
    """One kv-cached decoder step: toks (B,) at position ``pos`` (traced
    scalar) -> ((B,) next-token ids, updated self-attn caches). Exactly the
    math of decode_logits restricted to one query row, so the whole greedy
    decode compiles ONCE regardless of length (the prefix-recompute path
    compiles per length bucket — ruinous for the 32-layer sizes)."""
    cfg = self.cfg
    dec = params["decoder"]
    mha = MHAConfig(cfg.decoder_attention_heads, cfg.d_model)
    scale = 1.0 / math.sqrt(mha.d_k)

    def heads(y):
        b = y.shape[0]
        return y.reshape(b, 1, mha.n_head, mha.d_k).transpose(0, 2, 1, 3)

    x = jnp.take(dec["embed_tokens"], toks, axis=0)[:, None] \
        + jax.lax.dynamic_slice_in_dim(dec["embed_positions"], pos, 1, 0)[None]
    new_kv = []
    for li, lp in enumerate(dec["layers"]):
        res = x
        y = layer_norm_apply(lp["self_attn_layer_norm"], x)
        q = heads(linear_apply(lp["self_attn"]["linear_q"], y))
        k_new = heads(linear_apply(lp["self_attn"]["linear_k"], y))
        v_new = heads(linear_apply(lp["self_attn"]["linear_v"], y))
        k_c = jax.lax.dynamic_update_slice_in_dim(
            self_kv[li]["k"], k_new.astype(self_kv[li]["k"].dtype), pos, axis=2)
        v_c = jax.lax.dynamic_update_slice_in_dim(
            self_kv[li]["v"], v_new.astype(self_kv[li]["v"].dtype), pos, axis=2)
        new_kv.append({"k": k_c, "v": v_c})
        valid = (jnp.arange(k_c.shape[2]) <= pos)[None, None, None, :]
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k_c,
                            preferred_element_type=jnp.float32) * scale
        attn = masked_softmax(scores.astype(x.dtype), valid)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v_c,
                         preferred_element_type=jnp.float32)
        b = ctx.shape[0]
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, 1, mha.n_feat).astype(x.dtype)
        x = res + linear_apply(lp["self_attn"]["linear_out"], ctx)

        res = x
        y = layer_norm_apply(lp["encoder_attn_layer_norm"], x)
        q2 = heads(linear_apply(lp["encoder_attn"]["linear_q"], y))
        scores2 = jnp.einsum("bhqd,bhkd->bhqk", q2, cross_kv[li]["k"],
                             preferred_element_type=jnp.float32) * scale
        attn2 = masked_softmax(scores2.astype(x.dtype), None)
        ctx2 = jnp.einsum("bhqk,bhkd->bhqd", attn2, cross_kv[li]["v"],
                          preferred_element_type=jnp.float32)
        ctx2 = ctx2.transpose(0, 2, 1, 3).reshape(b, 1, mha.n_feat).astype(x.dtype)
        x = res + linear_apply(lp["encoder_attn"]["linear_out"], ctx2)

        res = x
        y = layer_norm_apply(lp["final_layer_norm"], x)
        x = res + _ffn(lp, y)
    x = layer_norm_apply(dec["layer_norm"], x)
    logits = jnp.matmul(x, dec["embed_tokens"].T.astype(x.dtype),
                        preferred_element_type=jnp.float32)
    return jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32), new_kv


class WhisperConfig(NamedTuple):
    vocab_size: int = 51866
    num_mel_bins: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    decoder_layers: int = 32
    encoder_attention_heads: int = 20
    decoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    decoder_ffn_dim: int = 5120
    max_source_positions: int = 1500
    max_target_positions: int = 448

    @property
    def mha(self):
        return MHAConfig(self.encoder_attention_heads, self.d_model)


SIZES = {
    "whisper-tiny": dict(d_model=384, encoder_layers=4, decoder_layers=4,
                         encoder_attention_heads=6, decoder_attention_heads=6,
                         encoder_ffn_dim=1536, decoder_ffn_dim=1536,
                         num_mel_bins=80, vocab_size=51865),
    "whisper-base": dict(d_model=512, encoder_layers=6, decoder_layers=6,
                         encoder_attention_heads=8, decoder_attention_heads=8,
                         encoder_ffn_dim=2048, decoder_ffn_dim=2048,
                         num_mel_bins=80, vocab_size=51865),
    "whisper-small": dict(d_model=768, encoder_layers=12, decoder_layers=12,
                          encoder_attention_heads=12, decoder_attention_heads=12,
                          encoder_ffn_dim=3072, decoder_ffn_dim=3072,
                          num_mel_bins=80, vocab_size=51865),
    "whisper-medium": dict(d_model=1024, encoder_layers=24, decoder_layers=24,
                           encoder_attention_heads=16, decoder_attention_heads=16,
                           encoder_ffn_dim=4096, decoder_ffn_dim=4096,
                           num_mel_bins=80, vocab_size=51865),
    "whisper-large-v2": dict(d_model=1280, encoder_layers=32, decoder_layers=32,
                             encoder_attention_heads=20, decoder_attention_heads=20,
                             encoder_ffn_dim=5120, decoder_ffn_dim=5120,
                             num_mel_bins=80, vocab_size=51865),
    "whisper-large-v3": dict(),  # defaults above
}


def _sinusoids(length: int, channels: int):
    """OpenAI whisper sinusoid table (sin||cos split)."""
    log_timescale = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def _enc_layer_init(rng, cfg):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "self_attn_layer_norm": layer_norm_init(cfg.d_model),
        "self_attn": mha_init(k1, cfg.mha),
        "final_layer_norm": layer_norm_init(cfg.d_model),
        "fc1": linear_init(k2, cfg.d_model, cfg.encoder_ffn_dim),
        "fc2": linear_init(k3, cfg.encoder_ffn_dim, cfg.d_model),
    }


def _dec_layer_init(rng, cfg):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    dec_mha = MHAConfig(cfg.decoder_attention_heads, cfg.d_model)
    return {
        "self_attn_layer_norm": layer_norm_init(cfg.d_model),
        "self_attn": mha_init(k1, dec_mha),
        "encoder_attn_layer_norm": layer_norm_init(cfg.d_model),
        "encoder_attn": mha_init(k2, dec_mha),
        "final_layer_norm": layer_norm_init(cfg.d_model),
        "fc1": linear_init(k3, cfg.d_model, cfg.decoder_ffn_dim),
        "fc2": linear_init(k4, cfg.decoder_ffn_dim, cfg.d_model),
    }


def _ffn(lp, x):
    return linear_apply(lp["fc2"], jax.nn.gelu(linear_apply(lp["fc1"], x),
                                               approximate=False))


class WhisperModel:
    """Functional whisper; registered per size below."""

    def __init__(self, whisper_size: str = "whisper-large-v3", vocab_size: int = -1,
                 **kwargs):
        conf = dict(SIZES.get(whisper_size, {}))
        conf.update({k: v for k, v in kwargs.items() if k in WhisperConfig._fields})
        if vocab_size and vocab_size > 0:
            conf["vocab_size"] = vocab_size
        self.cfg = WhisperConfig(**conf)
        self.size_name = whisper_size

    def init_params(self, rng):
        cfg = self.cfg
        keys = jax.random.split(rng, cfg.encoder_layers + cfg.decoder_layers + 6)
        from funasr_tpu.core.layers import conv1d_init
        enc = {
            "conv1": conv1d_init(keys[0], cfg.num_mel_bins, cfg.d_model, 3),
            "conv2": conv1d_init(keys[1], cfg.d_model, cfg.d_model, 3),
            "layers": [_enc_layer_init(keys[2 + i], cfg)
                       for i in range(cfg.encoder_layers)],
            "layer_norm": layer_norm_init(cfg.d_model),
        }
        off = 2 + cfg.encoder_layers
        dec = {
            "embed_tokens": jax.random.normal(
                keys[off], (cfg.vocab_size, cfg.d_model)) * 0.02,
            "embed_positions": jax.random.normal(
                keys[off + 1], (cfg.max_target_positions, cfg.d_model)) * 0.02,
            "layers": [_dec_layer_init(keys[off + 2 + i], cfg)
                       for i in range(cfg.decoder_layers)],
            "layer_norm": layer_norm_init(cfg.d_model),
        }
        return {"encoder": enc, "decoder": dec}

    # ------------------------------------------------------------------

    def encode(self, params, mel, mel_lens=None):
        """mel: (B, T, n_mels) -> (B, T//2, D)."""
        from funasr_tpu.core.layers import conv1d_apply
        cfg = self.cfg
        enc = params["encoder"]
        h = jax.nn.gelu(conv1d_apply(enc["conv1"], mel, left_pad=1, right_pad=1),
                        approximate=False)
        h = jax.nn.gelu(conv1d_apply(enc["conv2"], h, left_pad=1, right_pad=1,
                                     stride=2), approximate=False)
        t = h.shape[1]
        h = h + jnp.asarray(_sinusoids(cfg.max_source_positions, cfg.d_model))[:t]
        for lp in enc["layers"]:
            res = h
            x = layer_norm_apply(lp["self_attn_layer_norm"], h)
            h = res + mha_apply(lp["self_attn"], cfg.mha, x, x, x, None)
            res = h
            x = layer_norm_apply(lp["final_layer_norm"], h)
            h = res + _ffn(lp, x)
        h = layer_norm_apply(enc["layer_norm"], h)
        out_lens = None if mel_lens is None else mel_lens // 2
        return h, out_lens

    def decode_logits(self, params, tokens, encoder_out):
        """tokens: (B, L) -> (B, L, V) (teacher forced / prefix scoring)."""
        cfg = self.cfg
        dec = params["decoder"]
        l = tokens.shape[1]
        h = jnp.take(dec["embed_tokens"], tokens, axis=0) \
            + dec["embed_positions"][:l]
        causal = jnp.tril(jnp.ones((l, l), bool))[None]
        dec_mha = MHAConfig(cfg.decoder_attention_heads, cfg.d_model)
        for lp in dec["layers"]:
            res = h
            x = layer_norm_apply(lp["self_attn_layer_norm"], h)
            h = res + mha_apply(lp["self_attn"], dec_mha, x, x, x, causal)
            res = h
            x = layer_norm_apply(lp["encoder_attn_layer_norm"], h)
            h = res + mha_apply(lp["encoder_attn"], dec_mha, x, encoder_out,
                                encoder_out, None)
            res = h
            x = layer_norm_apply(lp["final_layer_norm"], h)
            h = res + _ffn(lp, x)
        h = layer_norm_apply(dec["layer_norm"], h)
        return jnp.matmul(h, dec["embed_tokens"].T.astype(h.dtype),
                          preferred_element_type=jnp.float32)

    def greedy_decode(self, params, encoder_out, prompt_ids, eot_id: int,
                      max_new: int = 128):
        """KV-cached greedy decode: ONE compiled single-token step for the
        whole loop (self-attn caches donated+updated in place, cross-attn k/v
        precomputed per utterance). Matches the prefix-recompute oracle
        (`_greedy_decode_prefix`) token-for-token."""
        from funasr_tpu.utils.bucket import bucket_length
        cfg = self.cfg
        b = encoder_out.shape[0]
        mha = MHAConfig(cfg.decoder_attention_heads, cfg.d_model)
        max_len = min(bucket_length(len(prompt_ids) + max_new, minimum=32,
                                    multiple=32), cfg.max_target_positions)
        # cache in the PARAM compute dtype (bf16 when serving): encoder_out
        # comes out of a fp32 layernorm, and an fp32 cache would both double
        # the HBM traffic of the memory-bound decode loop and dtype-mismatch
        # the bf16 k/v projections written into it
        kv_dtype = params["decoder"]["embed_tokens"].dtype
        self_kv = [{"k": jnp.zeros((b, mha.n_head, max_len, mha.d_k),
                                   kv_dtype),
                    "v": jnp.zeros((b, mha.n_head, max_len, mha.d_k),
                                   kv_dtype)}
                   for _ in range(cfg.decoder_layers)]
        cross_kv = _whisper_cross_kv_jit(self, params, encoder_out)

        tokens = [list(prompt_ids) for _ in range(b)]
        done = [False] * b
        cur = np.full((b,), prompt_ids[0], np.int32)
        for pos in range(max_len - 1):
            nxt, self_kv = _whisper_cached_step_jit(
                self, params, jnp.asarray(cur), self_kv, cross_kv,
                jnp.asarray(pos, jnp.int32))
            if pos + 1 < len(prompt_ids):
                cur = np.full((b,), prompt_ids[pos + 1], np.int32)
                continue
            nxt = np.asarray(nxt)
            for i in range(b):
                if done[i]:
                    continue
                tok = int(nxt[i])
                if tok == eot_id:
                    done[i] = True
                else:
                    tokens[i].append(tok)
            n_generated = pos + 2 - len(prompt_ids)
            if all(done) or n_generated >= max_new \
                    or max(len(t) for t in tokens) >= max_len:
                break
            cur = np.asarray([t[pos + 1] if pos + 1 < len(t) else eot_id
                              for t in tokens], np.int32)
        return [t[len(prompt_ids):] for t in tokens]

    def _greedy_decode_prefix(self, params, encoder_out, prompt_ids,
                              eot_id: int, max_new: int = 128):
        """Prefix-recompute greedy (the parity oracle for the cached path)."""
        from funasr_tpu.utils.bucket import bucket_length
        b = encoder_out.shape[0]
        tokens = [list(prompt_ids) for _ in range(b)]
        done = [False] * b
        for _ in range(max_new):
            lmax = bucket_length(max(len(t) for t in tokens), minimum=8, multiple=8)
            ys = np.zeros((b, lmax), np.int32)
            last = np.zeros((b,), np.int32)
            for i, t in enumerate(tokens):
                ys[i, : len(t)] = t
                last[i] = len(t) - 1
            nxt = np.asarray(_whisper_next_token_jit(
                self, params, jnp.asarray(ys), encoder_out,
                jnp.asarray(last)))
            for i in range(b):
                if done[i]:
                    continue
                tok = int(nxt[i])
                if tok == eot_id:
                    done[i] = True
                else:
                    tokens[i].append(tok)
            if all(done):
                break
        return [t[len(prompt_ids):] for t in tokens]

    def forward_jit(self, params, speech, speech_lengths, text, text_lengths, rng):
        """Training: CE over shifted decoder targets."""
        encoder_out, _ = self.encode(params, speech, speech_lengths)
        logits = self.decode_logits(params, text[:, :-1], encoder_out)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        ys_out = text[:, 1:]
        valid = jnp.arange(ys_out.shape[1])[None] < (text_lengths - 1)[:, None]
        tgt = jnp.where(valid, ys_out, 0)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0] * valid
        loss = jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)
        return loss, {"loss": loss}, speech.shape[0]

    def inference(self, params, data_in, data_lengths=None, key: Optional[List] = None,
                  tokenizer=None, frontend=None, **kwargs):
        from funasr_tpu.utils.load_utils import load_audio_text_image_video

        meta: Dict = {}
        t0 = time.perf_counter()
        audio_list = load_audio_text_image_video(
            data_in, fs=frontend.fs, audio_fs=kwargs.get("fs", 16000))
        meta["load_data"] = f"{time.perf_counter() - t0:0.3f}"
        from funasr_tpu.utils.load_utils import as_unit_f32
        mel, mel_lens = frontend.extract([as_unit_f32(a) for a in audio_list])
        meta["batch_data_time"] = sum(len(a) for a in audio_list) / 16000.0

        encoder_out, _ = self.encode(params, jnp.asarray(mel))
        prompt = kwargs.get("prompt_ids")
        eot = kwargs.get("eot_id", self.cfg.vocab_size - 1)
        if prompt is None and tokenizer is not None \
                and hasattr(tokenizer, "sot_sequence"):
            prompt = list(tokenizer.sot_sequence)
        if prompt is None:
            prompt = [0]
        hyps = self.greedy_decode(params, encoder_out, prompt, eot,
                                  max_new=kwargs.get("max_new_tokens", 128))
        if key is None:
            key = [f"rand_key_{i}" for i in range(len(hyps))]
        results = []
        for i, ids in enumerate(hyps):
            text = tokenizer.decode(ids) if tokenizer is not None else ""
            results.append({"key": key[i], "text": text})
        return results, meta


def convert_hf_whisper(state_dict, model: WhisperModel):
    """HF WhisperForConditionalGeneration state dict -> params."""
    def g(name):
        v = state_dict[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        return np.asarray(v, np.float32)

    def lin(prefix):
        p = {"w": g(prefix + ".weight").T}
        if prefix + ".bias" in state_dict:
            p["b"] = g(prefix + ".bias")
        return p

    def norm(prefix):
        return {"scale": g(prefix + ".weight"), "bias": g(prefix + ".bias")}

    def conv(prefix):
        return {"w": g(prefix + ".weight").transpose(2, 1, 0),
                "b": g(prefix + ".bias")}

    def mha(prefix):
        return {"linear_q": lin(prefix + ".q_proj"),
                "linear_k": lin(prefix + ".k_proj"),
                "linear_v": lin(prefix + ".v_proj"),
                "linear_out": lin(prefix + ".out_proj")}

    cfg = model.cfg
    pre = "model."
    enc = {
        "conv1": conv(pre + "encoder.conv1"),
        "conv2": conv(pre + "encoder.conv2"),
        "layers": [],
        "layer_norm": norm(pre + "encoder.layer_norm"),
    }
    for i in range(cfg.encoder_layers):
        p = f"{pre}encoder.layers.{i}"
        enc["layers"].append({
            "self_attn_layer_norm": norm(p + ".self_attn_layer_norm"),
            "self_attn": mha(p + ".self_attn"),
            "final_layer_norm": norm(p + ".final_layer_norm"),
            "fc1": lin(p + ".fc1"), "fc2": lin(p + ".fc2")})
    dec = {
        "embed_tokens": g(pre + "decoder.embed_tokens.weight"),
        "embed_positions": g(pre + "decoder.embed_positions.weight"),
        "layers": [],
        "layer_norm": norm(pre + "decoder.layer_norm"),
    }
    for i in range(cfg.decoder_layers):
        p = f"{pre}decoder.layers.{i}"
        dec["layers"].append({
            "self_attn_layer_norm": norm(p + ".self_attn_layer_norm"),
            "self_attn": mha(p + ".self_attn"),
            "encoder_attn_layer_norm": norm(p + ".encoder_attn_layer_norm"),
            "encoder_attn": mha(p + ".encoder_attn"),
            "final_layer_norm": norm(p + ".final_layer_norm"),
            "fc1": lin(p + ".fc1"), "fc2": lin(p + ".fc2")})
    return {"encoder": enc, "decoder": dec}


def _register_sizes():
    for size in list(SIZES) + ["Whisper-large-v3", "Whisper-large-v2",
                               "OpenAIWhisperModel", "WhisperWarp"]:
        canonical = size.lower() if size.lower().startswith("whisper") else \
            "whisper-large-v3"

        def make(sz):
            class _W(WhisperModel):
                def __init__(self, **kwargs):
                    kwargs.setdefault("whisper_size", sz)
                    super().__init__(**kwargs)
            _W.__name__ = f"Whisper_{sz.replace('-', '_')}"
            return _W

        tables.model_classes[size] = make(canonical)


_register_sizes()
