"""Qwen2/Qwen3-style decoder-only causal LM in JAX (the LLM half of Fun-ASR-Nano).

TPU-native replacement for the reference's HF/vLLM decoder (FunASR
``funasr/models/fun_asr_nano/model.py`` loads Qwen3-0.6B via transformers; serving
goes through vLLM). Architecture: RMSNorm, rotary embeddings, grouped-query attention
(optional per-head q/k RMSNorm = Qwen3), SwiGLU MLP, optional tied lm_head.

Decode path: pre-allocated (B, max_len) kv caches updated via dynamic slice; prefill
processes the whole (padded) prompt in one pass, then single-token steps — each a
fixed-shape jitted program, which is what makes continuous batching cheap on TPU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from funasr_tpu.core.layers import linear_init
from funasr_tpu.ops.quant import qlinear


class QwenConfig(NamedTuple):
    vocab_size: int = 151936
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    tie_word_embeddings: bool = True
    qkv_bias: bool = False       # qwen2: True, qwen3: False
    qk_norm: bool = False        # qwen3: True
    # Qwen3-MoE (HF qwen3_moe): num_experts routed SwiGLU experts of width
    # moe_intermediate_size, top-k softmax gating with renormalization
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: Optional[int] = None
    norm_topk_prob: bool = True

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def moe(self) -> bool:
        return self.num_experts > 0

    @classmethod
    def from_hf(cls, hf_config) -> "QwenConfig":
        d = hf_config.to_dict() if hasattr(hf_config, "to_dict") else dict(hf_config)
        mtype = d.get("model_type", "")
        is_qwen3 = mtype in ("qwen3", "qwen3_moe")
        return cls(
            vocab_size=d["vocab_size"], hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            num_key_value_heads=d.get("num_key_value_heads",
                                      d["num_attention_heads"]),
            head_dim=d.get("head_dim"),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            rope_theta=d.get("rope_theta", 1e6),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            qkv_bias=not is_qwen3 and mtype == "qwen2",
            qk_norm=is_qwen3,
            num_experts=d.get("num_experts", 0) if mtype == "qwen3_moe" else 0,
            num_experts_per_tok=d.get("num_experts_per_tok", 0),
            moe_intermediate_size=d.get("moe_intermediate_size"),
            norm_topk_prob=d.get("norm_topk_prob", True),
        )


def rms_norm(w, x, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(x.dtype)


def rope(x, positions, theta):
    """x: (B, T, H, hd); positions: (B, T) -> rotated (HF half-split convention)."""
    hd = x.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (B, T, hd/2)
    cos = jnp.cos(freqs)[:, :, None, :]
    sin = jnp.sin(freqs)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class QwenLM:
    def __init__(self, config: QwenConfig):
        self.cfg = config

    # -- params ------------------------------------------------------------

    def init_params(self, rng):
        c = self.cfg
        keys = jax.random.split(rng, c.num_hidden_layers + 3)

        def layer(k):
            ks = jax.random.split(k, 8)
            p = {
                "input_layernorm": jnp.ones((c.hidden_size,), jnp.float32),
                "post_attention_layernorm": jnp.ones((c.hidden_size,), jnp.float32),
                "q_proj": linear_init(ks[0], c.hidden_size,
                                      c.num_attention_heads * c.hd, bias=c.qkv_bias),
                "k_proj": linear_init(ks[1], c.hidden_size,
                                      c.num_key_value_heads * c.hd, bias=c.qkv_bias),
                "v_proj": linear_init(ks[2], c.hidden_size,
                                      c.num_key_value_heads * c.hd, bias=c.qkv_bias),
                "o_proj": linear_init(ks[3], c.num_attention_heads * c.hd,
                                      c.hidden_size, bias=False),
            }
            if c.moe:
                mi = c.moe_intermediate_size or c.intermediate_size
                ek = jax.random.split(ks[4], 3)
                scale_in = (c.hidden_size ** -0.5)
                p["gate"] = linear_init(ks[5], c.hidden_size, c.num_experts,
                                        bias=False)
                p["experts"] = {
                    "gate_proj": {"w": jax.random.normal(
                        ek[0], (c.num_experts, c.hidden_size, mi)) * scale_in},
                    "up_proj": {"w": jax.random.normal(
                        ek[1], (c.num_experts, c.hidden_size, mi)) * scale_in},
                    "down_proj": {"w": jax.random.normal(
                        ek[2], (c.num_experts, mi, c.hidden_size))
                        * (mi ** -0.5)},
                }
            else:
                p.update({
                    "gate_proj": linear_init(ks[4], c.hidden_size,
                                             c.intermediate_size, bias=False),
                    "up_proj": linear_init(ks[5], c.hidden_size,
                                           c.intermediate_size, bias=False),
                    "down_proj": linear_init(ks[6], c.intermediate_size,
                                             c.hidden_size, bias=False),
                })
            if c.qk_norm:
                p["q_norm"] = jnp.ones((c.hd,), jnp.float32)
                p["k_norm"] = jnp.ones((c.hd,), jnp.float32)
            return p

        params = {
            "embed_tokens": jax.random.normal(keys[0],
                                              (c.vocab_size, c.hidden_size)) * 0.02,
            "layers": [layer(keys[1 + i]) for i in range(c.num_hidden_layers)],
            "norm": jnp.ones((c.hidden_size,), jnp.float32),
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = linear_init(keys[-1], c.hidden_size, c.vocab_size,
                                            bias=False)
        return params

    def init_kv_cache(self, batch: int, max_len: int, dtype=jnp.bfloat16):
        c = self.cfg
        return [
            {"k": jnp.zeros((batch, max_len, c.num_key_value_heads, c.hd), dtype),
             "v": jnp.zeros((batch, max_len, c.num_key_value_heads, c.hd), dtype)}
            for _ in range(c.num_hidden_layers)
        ]

    # -- forward -----------------------------------------------------------

    def _attn(self, lp, x, positions, kv, write_pos, kv_lens):
        """x: (B, T, D); kv: layer cache; write_pos: (B,) start index to write the
        new T keys; kv_lens: (B,) total valid cache length AFTER this write."""
        c = self.cfg
        b, t, _ = x.shape

        def proj(p, n_heads):
            return qlinear(p, x).reshape(b, t, n_heads, c.hd)

        q = proj(lp["q_proj"], c.num_attention_heads)
        k = proj(lp["k_proj"], c.num_key_value_heads)
        v = proj(lp["v_proj"], c.num_key_value_heads)
        if c.qk_norm:
            q = rms_norm(lp["q_norm"], q, c.rms_norm_eps)
            k = rms_norm(lp["k_norm"], k, c.rms_norm_eps)
        q = rope(q, positions, c.rope_theta)
        k = rope(k, positions, c.rope_theta)

        # scatter new keys into the cache at per-row write positions
        max_len = kv["k"].shape[1]
        idx = (write_pos[:, None] + jnp.arange(t)[None, :]) % max_len  # (B, T)
        k_cache = _scatter_time(kv["k"], k.astype(kv["k"].dtype), idx)
        v_cache = _scatter_time(kv["v"], v.astype(kv["v"].dtype), idx)
        new_kv = {"k": k_cache, "v": v_cache}

        # grouped-query attention WITHOUT materializing a repeated cache:
        # q regroups to (B, T, K, G, hd) and contracts against the (B, S, K,
        # hd) cache directly. Decode is KV-bandwidth-bound, so jnp.repeat
        # (which doubles the cache bytes touched per step) was the dominant
        # HBM cost; the grouped einsum reads each cache row exactly once.
        n_rep = c.num_attention_heads // c.num_key_value_heads
        scale = c.hd ** -0.5
        qg = (q.astype(jnp.float32) * scale).reshape(
            b, t, c.num_key_value_heads, n_rep, c.hd)
        scores = jnp.einsum("btkgd,bskd->bkgts", qg,
                            k_cache.astype(jnp.float32))
        # causal + validity mask: query i (global pos = write_pos + i) sees cache
        # positions < write_pos + i + 1 and < kv_lens
        qpos = positions[:, None, None, :, None]  # (B, 1, 1, T, 1)
        spos = jnp.arange(max_len)[None, None, None, None, :]
        valid = (spos <= qpos) & (spos < kv_lens[:, None, None, None, None])
        scores = jnp.where(valid, scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bkgts,bskd->btkgd", attn.astype(x.dtype), v_cache)
        ctx = ctx.reshape(b, t, c.num_attention_heads * c.hd)
        out = qlinear(lp["o_proj"], ctx)
        return out, new_kv

    def _mlp(self, lp, x):
        g = qlinear(lp["gate_proj"], x)
        u = qlinear(lp["up_proj"], x)
        h = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
        return qlinear(lp["down_proj"], h)

    def _moe_mlp(self, lp, x):
        """Qwen3-MoE sparse block (HF ``Qwen3MoeSparseMoeBlock``): softmax
        router -> top-k experts (renormalized when norm_topk_prob) -> weighted
        sum of per-expert SwiGLU outputs.

        Executed DENSELY over the stacked expert dim (one einsum per
        projection) with a zero-masked combine — the jit/TPU-friendly form:
        static shapes, the expert dim is a physical array axis that expert
        parallelism shards over the mesh's "model" axis (GSPMD inserts the
        output psum), and no per-token gather/scatter. Costs E/k x the
        selected-expert FLOPs; EP spreads that across devices."""
        c = self.cfg
        router = qlinear(lp["gate"], x).astype(jnp.float32)     # (B, T, E)
        probs = jax.nn.softmax(router, axis=-1)
        topv, topi = jax.lax.top_k(probs, c.num_experts_per_tok)
        if c.norm_topk_prob:
            topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
        # (B, T, E) combine weights, zero outside the top-k
        gates = jnp.sum(
            jax.nn.one_hot(topi, c.num_experts, dtype=jnp.float32)
            * topv[..., None], axis=-2)
        g = jnp.einsum("btd,edh->beth", x, lp["experts"]["gate_proj"]["w"]
                       .astype(x.dtype))
        u = jnp.einsum("btd,edh->beth", x, lp["experts"]["up_proj"]["w"]
                       .astype(x.dtype))
        h = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
        y = jnp.einsum("beth,ehd->betd", h, lp["experts"]["down_proj"]["w"]
                       .astype(x.dtype))
        return jnp.einsum("betd,bte->btd", y, gates.astype(x.dtype))

    def forward_hidden(self, params, input_embeds, positions, kv_cache,
                       write_pos, kv_lens):
        """Transformer stack only: (B, T, D) embeds -> ((B, T, D) pre-final-norm
        hidden states, new_kv_cache). Callers that need logits for a subset of
        positions (prefill wants only the last one) gather BEFORE
        :meth:`logits_head` — the vocab matmul is ~150x wider than the stack's
        hidden dim, so computing it over a whole prompt chunk is pure waste."""
        c = self.cfg
        x = input_embeds
        new_cache = []
        for i, lp in enumerate(params["layers"]):
            h = rms_norm(lp["input_layernorm"], x, c.rms_norm_eps)
            h, kv = self._attn(lp, h, positions, kv_cache[i], write_pos, kv_lens)
            x = x + h
            h = rms_norm(lp["post_attention_layernorm"], x, c.rms_norm_eps)
            x = x + (self._moe_mlp(lp, h) if "experts" in lp
                     else self._mlp(lp, h))
            new_cache.append(kv)
        return x, new_cache

    def logits_head(self, params, x):
        """Final RMSNorm + vocab projection: (B, T, D) -> (B, T, V) f32."""
        c = self.cfg
        x = rms_norm(params["norm"], x, c.rms_norm_eps)
        if c.tie_word_embeddings:
            logits = jnp.matmul(x, params["embed_tokens"].T.astype(x.dtype),
                                preferred_element_type=jnp.float32)
        else:
            logits = qlinear(params["lm_head"], x).astype(jnp.float32)
        return logits.astype(jnp.float32)

    def forward(self, params, input_embeds, positions, kv_cache, write_pos, kv_lens):
        """input_embeds: (B, T, D); positions: (B, T) global positions; returns
        (logits (B, T, V), new_kv_cache)."""
        x, new_cache = self.forward_hidden(params, input_embeds, positions,
                                           kv_cache, write_pos, kv_lens)
        return self.logits_head(params, x), new_cache

    def embed(self, params, token_ids, dtype=jnp.bfloat16):
        # mode="clip" matches jit semantics; eager default would NaN-fill
        # out-of-range ids (e.g. ChatML ids against a tiny test vocab)
        return jnp.take(params["embed_tokens"], token_ids, axis=0,
                        mode="clip").astype(dtype)

    def forward_embeds(self, params, input_embeds):
        """Full-sequence causal forward without a persistent cache:
        (B, T, D) embeds -> (B, T, V) logits (training / teacher forcing)."""
        b, t, _ = input_embeds.shape
        kv = self.init_kv_cache(b, t, dtype=input_embeds.dtype)
        positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
        write_pos = jnp.zeros((b,), jnp.int32)
        kv_lens = jnp.full((b,), t, jnp.int32)
        logits, _ = self.forward(params, input_embeds, positions, kv,
                                 write_pos, kv_lens)
        return logits


def _scatter_time(cache, new, idx):
    """cache (B, S, H, hd) <- new (B, T, H, hd) at per-row time indices idx (B, T)."""
    b, t = idx.shape
    b_idx = jnp.arange(b)[:, None].repeat(t, axis=1)
    return cache.at[b_idx, idx].set(new)


def convert_hf_qwen(state_dict, config: QwenConfig):
    """HF Qwen2/Qwen3 state dict -> params pytree."""
    import numpy as np

    def g(name):
        v = state_dict[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        return np.asarray(v, np.float32)

    def lin(prefix, bias):
        p = {"w": g(prefix + ".weight").T}
        if bias and prefix + ".bias" in state_dict:
            p["b"] = g(prefix + ".bias")
        return p

    layers = []
    for i in range(config.num_hidden_layers):
        pre = f"model.layers.{i}"
        lp = {
            "input_layernorm": g(f"{pre}.input_layernorm.weight"),
            "post_attention_layernorm": g(f"{pre}.post_attention_layernorm.weight"),
            "q_proj": lin(f"{pre}.self_attn.q_proj", config.qkv_bias),
            "k_proj": lin(f"{pre}.self_attn.k_proj", config.qkv_bias),
            "v_proj": lin(f"{pre}.self_attn.v_proj", config.qkv_bias),
            "o_proj": lin(f"{pre}.self_attn.o_proj", False),
        }
        if f"{pre}.mlp.gate.weight" in state_dict:
            # qwen3_moe sparse layer: router + stacked routed experts
            lp["gate"] = lin(f"{pre}.mlp.gate", False)
            lp["experts"] = {
                nm: {"w": np.stack(
                    [g(f"{pre}.mlp.experts.{j}.{nm}.weight").T
                     for j in range(config.num_experts)])}
                for nm in ("gate_proj", "up_proj", "down_proj")}
        else:
            lp.update({
                "gate_proj": lin(f"{pre}.mlp.gate_proj", False),
                "up_proj": lin(f"{pre}.mlp.up_proj", False),
                "down_proj": lin(f"{pre}.mlp.down_proj", False),
            })
        if config.qk_norm:
            lp["q_norm"] = g(f"{pre}.self_attn.q_norm.weight")
            lp["k_norm"] = g(f"{pre}.self_attn.k_norm.weight")
        layers.append(lp)
    params = {
        "embed_tokens": g("model.embed_tokens.weight"),
        "layers": layers,
        "norm": g("model.norm.weight"),
    }
    if not config.tie_word_embeddings and "lm_head.weight" in state_dict:
        params["lm_head"] = lin("lm_head", False)
    return params
