"""Continuous-batching engine + Fun-ASR-Nano end-to-end (tiny random LLM)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from funasr_tpu.models.llm.qwen import QwenConfig, QwenLM

CFG = QwenConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                 num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                 head_dim=8, tie_word_embeddings=True, qk_norm=True,
                 rope_theta=10000.0)


@pytest.fixture(scope="module")
def lm_and_params():
    lm = QwenLM(CFG)
    params = lm.init_params(jax.random.PRNGKey(0))
    return lm, params


def _greedy_reference(lm, params, embeds, n_new):
    """Straightforward full-recompute greedy decode as the oracle."""
    ids = []
    cur = jnp.asarray(embeds[None], jnp.float32)
    for _ in range(n_new):
        t = cur.shape[1]
        kv = lm.init_kv_cache(1, t + 1, jnp.float32)
        logits, _ = lm.forward(params, cur, jnp.arange(t)[None], kv,
                               jnp.zeros((1,), jnp.int32),
                               jnp.full((1,), t, jnp.int32))
        tok = int(jnp.argmax(logits[0, -1]))
        ids.append(tok)
        cur = jnp.concatenate([cur, lm.embed(params, jnp.asarray([[tok]]),
                                             jnp.float32)], axis=1)
    return ids


def test_engine_matches_naive_greedy(lm_and_params):
    from funasr_tpu.llm.engine import LLMEngine, Request
    lm, params = lm_and_params
    rng = np.random.default_rng(0)
    n_new = 6

    prompts = [rng.standard_normal((np.random.default_rng(i).integers(5, 12), 32))
               .astype(np.float32) for i in range(3)]
    want = [_greedy_reference(lm, params, p, n_new) for p in prompts]

    engine = LLMEngine(lm, params, num_slots=2, max_len=64, dtype=jnp.float32)
    reqs = [Request(request_id=i, input_embeds=p, max_new_tokens=n_new)
            for i, p in enumerate(prompts)]
    engine.generate(reqs)  # 3 requests through 2 slots -> continuous batching
    for r, w in zip(reqs, want):
        assert r.output_ids == w, (r.output_ids, w)


def test_engine_eos_stops(lm_and_params):
    from funasr_tpu.llm.engine import LLMEngine, Request
    lm, params = lm_and_params
    rng = np.random.default_rng(1)
    prompt = rng.standard_normal((8, 32)).astype(np.float32)
    first = _greedy_reference(lm, params, prompt, 1)[0]
    engine = LLMEngine(lm, params, num_slots=2, max_len=64, dtype=jnp.float32)
    req = Request(request_id=0, input_embeds=prompt, max_new_tokens=10,
                  eos_token_ids=(first,))
    engine.generate([req])
    assert req.output_ids == [first]


def test_fun_asr_nano_e2e():
    from funasr_tpu.frontends.wav_frontend import WavFrontend
    from funasr_tpu.models.fun_asr_nano.model import FunASRNano

    class Tok:
        def encode(self, text):
            return [ord(c) % 96 for c in text][:8]

        def decode(self, ids):
            return "".join(chr(97 + (i % 26)) for i in ids)

    model = FunASRNano(
        input_size=560,
        audio_encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                                num_blocks=2, kernel_size=5),
        audio_adaptor="Linear",
        audio_adaptor_conf=dict(downsample_rate=2, ffn_dim=32),
        llm_conf=dict(CFG._asdict()))
    params = model.init_params(jax.random.PRNGKey(0))
    frontend = WavFrontend(fs=16000, lfr_m=7, lfr_n=6, n_mels=80, dither=0.0)
    wav = (np.random.default_rng(0).standard_normal(16000) * 0.1).astype(np.float32)
    res, _ = model.inference(params, [wav, wav[:8000]], tokenizer=Tok(),
                             frontend=frontend, max_new_tokens=5, num_slots=2)
    assert len(res) == 2 and all("text" in r for r in res)
