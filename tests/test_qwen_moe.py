"""Qwen3-MoE LM: numerical parity vs live HF transformers + expert-parallel
sharding.

The reference serves Fun-ASR-Nano through vLLM over HF Qwen checkpoints
(``funasr/models/fun_asr_nano/inference_vllm.py``); the JAX LM here covers
the MoE variants of that family (HF ``qwen3_moe``: softmax router, top-k
renormalized gating, routed SwiGLU experts). Expert parallelism shards the
stacked expert dim over the mesh's "model" axis (``parallel/sharding.py``
param policy) — the ep in dp/tp/sp/pp/ep.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_moe():
    import torch
    from transformers.models.qwen3_moe import (Qwen3MoeConfig,
                                               Qwen3MoeForCausalLM)

    cfg_hf = Qwen3MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        tie_word_embeddings=True, rope_theta=1e6)
    torch.manual_seed(0)
    return cfg_hf, Qwen3MoeForCausalLM(cfg_hf).eval()


def _jax_lm(tiny_moe):
    from funasr_tpu.models.llm.qwen import QwenConfig, QwenLM, convert_hf_qwen

    cfg_hf, hf = tiny_moe
    cfg = QwenConfig.from_hf(cfg_hf)
    lm = QwenLM(cfg)
    params = convert_hf_qwen(hf.state_dict(), cfg)
    return lm, params, cfg


def test_config_from_hf(tiny_moe):
    _, _, cfg = _jax_lm(tiny_moe)
    assert cfg.moe and cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    assert cfg.moe_intermediate_size == 48 and cfg.qk_norm and not cfg.qkv_bias


def test_moe_logits_parity(tiny_moe):
    import torch

    cfg_hf, hf = tiny_moe
    lm, params, _ = _jax_lm(tiny_moe)
    ids = np.array([[1, 5, 9, 33, 77, 2], [3, 8, 120, 4, 6, 7]])
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    emb = lm.embed(params, jnp.asarray(ids), dtype=jnp.float32)
    out = np.asarray(lm.forward_embeds(params, emb))
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_moe_decode_matches_prefill(tiny_moe):
    """KV-cached stepwise decode gives the same logits as the full forward."""
    lm, params, cfg = _jax_lm(tiny_moe)
    ids = np.array([[1, 5, 9, 33]])
    emb = lm.embed(params, jnp.asarray(ids), dtype=jnp.float32)
    full = np.asarray(lm.forward_embeds(params, emb))

    kv = lm.init_kv_cache(1, 8, dtype=jnp.float32)
    outs = []
    for t in range(4):
        logits, kv = lm.forward(
            params, emb[:, t:t + 1], jnp.array([[t]]), kv,
            jnp.array([t], jnp.int32), jnp.array([t + 1], jnp.int32))
        outs.append(np.asarray(logits)[:, 0])
    np.testing.assert_allclose(np.stack(outs, axis=1), full, atol=1e-3)


def test_expert_parallel_sharding(tiny_moe):
    """Experts shard over the "model" axis; sharded logits match 1-device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from funasr_tpu.parallel.sharding import (batch_shardings, make_mesh,
                                              param_shardings)

    lm, params, cfg = _jax_lm(tiny_moe)
    ids = np.array([[1, 5, 9, 33, 77, 2], [3, 8, 120, 4, 6, 7]])
    emb = lm.embed(params, jnp.asarray(ids), dtype=jnp.float32)
    gold = np.asarray(lm.forward_embeds(params, emb))

    mesh = make_mesh(8, model=4)  # dp=2 x ep=4 (4 experts, 1 per device)
    shardings = param_shardings(params, mesh)
    spec = str(shardings["layers"][0]["experts"]["gate_proj"]["w"].spec)
    assert "model" in spec, f"expert dim not sharded: {spec}"
    p = jax.device_put(params, shardings)
    e = jax.device_put(emb, batch_shardings(mesh, emb))
    with mesh:
        out = np.asarray(jax.jit(lm.forward_embeds)(p, e))
    np.testing.assert_allclose(out, gold, atol=1e-3)


def test_moe_engine_generate(tiny_moe):
    """The continuous-batching engine drives an MoE LM unchanged."""
    from funasr_tpu.llm.engine import LLMEngine, Request

    lm, params, cfg = _jax_lm(tiny_moe)
    eng = LLMEngine(lm, params, num_slots=2, max_len=32, dtype=jnp.float32,
                    init_cache_len=32)
    emb = lambda ids: np.asarray(
        lm.embed(params, jnp.asarray(ids), dtype=jnp.float32))
    reqs = [Request(request_id=0, input_embeds=emb([1, 5, 9]),
                    max_new_tokens=4),
            Request(request_id=1, input_embeds=emb([3, 8]),
                    max_new_tokens=4)]
    done = eng.generate(reqs)
    assert all(1 <= len(r.output_ids) <= 4 for r in done)
