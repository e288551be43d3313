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


def test_w8a8_qlinear(rng):
    """Dynamic per-token activation quant + int8 matmul stays close to fp32."""
    from funasr_tpu.ops.quant import qlinear, quantize_linear_int8
    w = rng.standard_normal((512, 256)).astype(np.float32)
    p = {"w": jnp.asarray(w), "b": jnp.asarray(rng.standard_normal(256),
                                               jnp.float32)}
    q = quantize_linear_int8(p, key="w_q8")
    assert q["w_q8"].dtype == jnp.int8
    x = jnp.asarray(rng.standard_normal((3, 7, 512)), jnp.float32)
    y_fp = qlinear(p, x)
    y_q = qlinear(q, x)
    assert y_q.shape == y_fp.shape == (3, 7, 256)
    rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
    assert rel < 3e-2, rel


def test_w8a8_stacked_scan_kernels(rng):
    """(L, in, out) scan-stacked linears quantize per layer and slice cleanly."""
    from funasr_tpu.ops.quant import qlinear, quantize_params_int8
    params = {"encoders": {
        "linear_q_k_v": {"w": jnp.asarray(rng.standard_normal((4, 512, 768)),
                                          jnp.float32),
                         "b": jnp.zeros((4, 768,), jnp.float32)},
        "cif_conv1d": {"w": jnp.asarray(rng.standard_normal((3, 512, 512)),
                                        jnp.float32)},
    }}
    q = quantize_params_int8(params, mode="w8a8")
    lin = q["encoders"]["linear_q_k_v"]
    assert lin["w_q8"].shape == (4, 512, 768) and lin["scale"].shape == (4, 768)
    # conv kernels are shape-ambiguous with stacked linears — must stay fp32
    assert "w" in q["encoders"]["cif_conv1d"]

    def body(x, lp):
        return qlinear(lp, x), None

    x = jnp.asarray(rng.standard_normal((2, 768)), jnp.float32)
    # pad input to 768 per layer by projecting through each stacked slice
    x0 = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    y0 = qlinear(jax.tree_util.tree_map(lambda a: a[0], lin), x0)
    y0_fp = x0 @ params["encoders"]["linear_q_k_v"]["w"][0]
    rel = float(jnp.linalg.norm(y0 - y0_fp) / jnp.linalg.norm(y0_fp))
    assert rel < 3e-2, rel


def test_quantize_params_skips_embeddings(rng):
    """{"w"}-shaped embedding tables under *embed* keys are never quantized."""
    from funasr_tpu.ops.quant import quantize_params_int8
    params = {
        "embed": {"w": jnp.asarray(rng.standard_normal((1000, 512)),
                                   jnp.float32)},
        "bias_embed": {"w": jnp.asarray(rng.standard_normal((1000, 512)),
                                        jnp.float32)},
        "output_layer": {"w": jnp.asarray(rng.standard_normal((512, 1000)),
                                          jnp.float32)},
    }
    q = quantize_params_int8(params)
    assert "w" in q["embed"] and "w" in q["bias_embed"]
    assert "w_q" in q["output_layer"]


def test_w8a8_paraformer_encoder_parity(rng):
    """W8A8 SANM encoder output stays within the int8 serving budget."""
    from funasr_tpu.models.sanm.encoder import SANMEncoder
    from funasr_tpu.ops.quant import quantize_params_int8
    enc = SANMEncoder(input_size=80, output_size=256, attention_heads=4,
                      linear_units=512, num_blocks=3, dropout_rate=0.0,
                      input_layer="pe", kernel_size=11, sanm_shfit=0)
    params = enc.init(jax.random.PRNGKey(0))
    params_q = quantize_params_int8(params, mode="w8a8")
    x = jnp.asarray(rng.standard_normal((2, 40, 80)) * 0.3, jnp.float32)
    lens = jnp.asarray([40, 33], jnp.int32)
    y, _ = enc(params, x, lens)
    y_q, _ = enc(params_q, x, lens)
    rel = float(jnp.linalg.norm(y_q - y) / jnp.linalg.norm(y))
    assert rel < 5e-2, rel


def test_w8a8_sensevoice_ctc_parity(rng):
    """W8A8 SenseVoice (shared SAN-M stack + CTC head) stays within budget."""
    from funasr_tpu.models.sense_voice.model import SenseVoiceSmall
    from funasr_tpu.ops.quant import quantize_params_int8
    model = SenseVoiceSmall(
        input_size=80, vocab_size=300, blank_id=0,
        encoder_conf=dict(output_size=256, attention_heads=4,
                          linear_units=512, num_blocks=2, tp_blocks=1,
                          kernel_size=11))
    params = model.init_params(jax.random.PRNGKey(0))
    params_q = quantize_params_int8(params, mode="w8a8")
    x = jnp.asarray(rng.standard_normal((2, 36, 80)) * 0.3, jnp.float32)
    lens = jnp.asarray([36, 30], jnp.int32)
    lid = jnp.zeros((2,), jnp.int32)
    tn = jnp.zeros((2,), jnp.int32)
    y, ylens, _ = model.infer_jit(params, x, lens, lid, tn)
    y_q, ylens_q, _ = model.infer_jit(params_q, x, lens, lid, tn)
    np.testing.assert_array_equal(np.asarray(ylens), np.asarray(ylens_q))
    agree = float(np.mean(np.asarray(y) == np.asarray(y_q)))
    assert agree > 0.9, agree


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
