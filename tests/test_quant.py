"""Weight-only int8 quantization: roundtrip, qlinear, engine equivalence."""

import jax
import jax.numpy as jnp
import numpy as np


def test_quant_roundtrip(rng):
    from funasr_tpu.ops.quant import (dequantize_linear_int8, qlinear,
                                      quantize_linear_int8)
    w = rng.standard_normal((512, 256)).astype(np.float32)
    p = {"w": jnp.asarray(w), "b": jnp.asarray(rng.standard_normal(256),
                                               jnp.float32)}
    q = quantize_linear_int8(p)
    assert q["w_q"].dtype == jnp.int8
    wd = np.asarray(dequantize_linear_int8(q)["w"])
    # per-channel max error bounded by scale/2
    scale = np.abs(w).max(0) / 127.0
    assert np.all(np.abs(wd - w) <= scale[None, :] * 0.5 + 1e-7)
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    y_fp = qlinear(p, x)
    y_q = qlinear(q, x)
    rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
    assert rel < 2e-2, rel


def test_quantize_params_tree(rng):
    from funasr_tpu.ops.quant import quantize_params_int8, quantized_bytes
    params = {
        "big": {"w": jnp.asarray(rng.standard_normal((512, 512)), jnp.float32)},
        "small": {"w": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)},
        "norm": {"scale": jnp.ones((512,)), "bias": jnp.zeros((512,))},
        "nested": [{"w": jnp.asarray(rng.standard_normal((300, 600)),
                                     jnp.float32), "b": jnp.zeros((600,))}],
    }
    before = quantized_bytes(params)
    q = quantize_params_int8(params, min_dim=256)
    after = quantized_bytes(q)
    assert "w_q" in q["big"] and "w" in q["small"]  # small stays fp32
    assert "w_q" in q["nested"][0] and "b" in q["nested"][0]
    assert "scale" in q["norm"] and "bias" in q["norm"]  # norm untouched
    assert after < before * 0.45  # ~4x on the big mats


def test_qwen_engine_int8_matches_bf16(rng):
    """Greedy decode with int8 weights matches fp32 on a tiny random QwenLM."""
    from funasr_tpu.models.llm.qwen import QwenConfig, QwenLM
    from funasr_tpu.ops.quant import quantize_params_int8
    cfg = QwenConfig(vocab_size=64, hidden_size=256, intermediate_size=512,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=64, tie_word_embeddings=False)
    lm = QwenLM(cfg)
    params = lm.init_params(jax.random.PRNGKey(0))
    params_q = quantize_params_int8(params, min_dim=64)

    emb = jnp.asarray(rng.standard_normal((1, 6, 256)) * 0.1, jnp.float32)
    pos = jnp.arange(6)[None]
    kv = lm.init_kv_cache(1, 16, jnp.float32)
    kv_q = lm.init_kv_cache(1, 16, jnp.float32)
    wp = jnp.zeros((1,), jnp.int32)
    lens = jnp.asarray([6])
    logits, _ = lm.forward(params, emb, pos, kv, wp, lens)
    logits_q, _ = lm.forward(params_q, emb, pos, kv_q, wp, lens)
    # logits drift bounded; argmax (greedy token) almost always identical
    drift = float(jnp.max(jnp.abs(logits - logits_q)))
    assert drift < 0.5, drift
    agree = float(jnp.mean((jnp.argmax(logits, -1)
                            == jnp.argmax(logits_q, -1)).astype(jnp.float32)))
    assert agree >= 5 / 6, agree
