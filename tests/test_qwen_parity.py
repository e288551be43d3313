"""Qwen LM parity vs HF transformers (tiny random Qwen3 + Qwen2 configs)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_qwen3():
    from transformers.models.qwen3 import Qwen3Config, Qwen3ForCausalLM
    cfg = Qwen3Config(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=8, max_position_embeddings=256,
                      tie_word_embeddings=True, rope_theta=10000.0)
    torch.manual_seed(0)
    return cfg, Qwen3ForCausalLM(cfg).eval()


def test_qwen3_logits_parity():
    from funasr_tpu.models.llm.qwen import QwenConfig, QwenLM, convert_hf_qwen
    import jax.numpy as jnp

    hf_cfg, hf_model = _tiny_qwen3()
    cfg = QwenConfig.from_hf(hf_cfg)
    assert cfg.qk_norm and not cfg.qkv_bias
    lm = QwenLM(cfg)
    params = convert_hf_qwen(dict(hf_model.state_dict()), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 10)).astype(np.int64)
    with torch.no_grad():
        want = hf_model(torch.from_numpy(ids)).logits.numpy()

    embeds = lm.embed(params, jnp.asarray(ids), dtype=jnp.float32)
    positions = jnp.tile(jnp.arange(10)[None], (2, 1))
    kv = lm.init_kv_cache(2, 16, dtype=jnp.float32)
    logits, kv = lm.forward(params, embeds, positions, kv,
                            write_pos=jnp.zeros((2,), jnp.int32),
                            kv_lens=jnp.full((2,), 10, jnp.int32))
    got = np.asarray(logits)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_qwen3_incremental_decode_matches_full():
    """Prefill + single-token steps must equal one full forward."""
    from funasr_tpu.models.llm.qwen import QwenConfig, QwenLM, convert_hf_qwen
    import jax.numpy as jnp

    hf_cfg, hf_model = _tiny_qwen3()
    cfg = QwenConfig.from_hf(hf_cfg)
    lm = QwenLM(cfg)
    params = convert_hf_qwen(dict(hf_model.state_dict()), cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, (1, 12)).astype(np.int64)
    embeds = lm.embed(params, jnp.asarray(ids), dtype=jnp.float32)

    # full forward
    pos = jnp.arange(12)[None]
    kv = lm.init_kv_cache(1, 16, dtype=jnp.float32)
    full_logits, _ = lm.forward(params, embeds, pos, kv,
                                jnp.zeros((1,), jnp.int32),
                                jnp.full((1,), 12, jnp.int32))

    # prefill 8 then 4 single steps
    kv = lm.init_kv_cache(1, 16, dtype=jnp.float32)
    logits_p, kv = lm.forward(params, embeds[:, :8], pos[:, :8], kv,
                              jnp.zeros((1,), jnp.int32),
                              jnp.full((1,), 8, jnp.int32))
    step_logits = [logits_p[:, -1]]
    for t in range(8, 12):
        lg, kv = lm.forward(params, embeds[:, t:t + 1], pos[:, t:t + 1], kv,
                            jnp.full((1,), t, jnp.int32),
                            jnp.full((1,), t + 1, jnp.int32))
        step_logits.append(lg[:, 0])
    inc = np.stack([np.asarray(x)[0] for x in step_logits], axis=0)
    want = np.asarray(full_logits)[0, 7:]
    np.testing.assert_allclose(inc, want, rtol=2e-3, atol=2e-3)
