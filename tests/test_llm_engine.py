"""Continuous-batching engine + Fun-ASR-Nano end-to-end (tiny random LLM)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from funasr_tpu.models.llm.qwen import QwenConfig, QwenLM

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

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


def test_multi_step_decode_matches_single_step(lm_and_params):
    """The k-step on-device decode path (decode_chunk>1) produces the same
    tokens as the per-step host loop, including EOS mid-chunk."""
    from funasr_tpu.llm.engine import LLMEngine, Request
    lm, params = lm_and_params
    rng = np.random.default_rng(7)
    prompts = [rng.standard_normal((9 + i, 32)).astype(np.float32)
               for i in range(3)]
    eos = _greedy_reference(lm, params, prompts[1], 4)[3]  # fires mid-chunk

    outs = []
    for chunk in (1, 8):
        engine = LLMEngine(lm, params, num_slots=2, max_len=64,
                           dtype=jnp.float32)
        engine.decode_chunk = chunk
        reqs = [Request(request_id=i, input_embeds=p, max_new_tokens=11,
                        eos_token_ids=(eos,))
                for i, p in enumerate(prompts)]
        engine.generate(reqs)
        outs.append([r.output_ids for r in reqs])
    assert outs[0] == outs[1], outs


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


def test_chunked_prefill_no_head_of_line_blocking(lm_and_params):
    """A long prompt admitting must NOT stall in-flight decodes: prefill runs
    one chunk per engine step, so the active request keeps emitting one token
    per step while the long prompt admits (vLLM chunked-prefill role)."""
    from funasr_tpu.llm.engine import LLMEngine, Request
    lm, params = lm_and_params
    rng = np.random.default_rng(3)

    engine = LLMEngine(lm, params, num_slots=2, max_len=512,
                       dtype=jnp.float32, prefill_chunk=32,
                       init_cache_len=512)
    short = Request(request_id=0,
                    input_embeds=rng.standard_normal((8, 32)).astype(np.float32),
                    max_new_tokens=64)
    engine.submit(short)
    while len(short.output_ids) < 2:
        engine.step()

    long = Request(request_id=1,
                   input_embeds=rng.standard_normal((128, 32)).astype(np.float32),
                   max_new_tokens=4)
    engine.submit(long)
    a_before = len(short.output_ids)
    steps = 0
    while not long.output_ids:
        engine.step()
        steps += 1
        assert steps < 50
    # 128-token prompt / 32-token chunks = 4 prefill steps; the short request
    # decoded one token on every one of them
    assert steps >= 4, steps
    gained = len(short.output_ids) - a_before
    assert gained >= steps - 1, (gained, steps)


def test_chunked_prefill_matches_oneshot(lm_and_params):
    """Slice-by-slice prefill produces the same greedy continuation as the
    full-recompute oracle."""
    from funasr_tpu.llm.engine import LLMEngine, Request
    lm, params = lm_and_params
    rng = np.random.default_rng(4)
    prompt = rng.standard_normal((70, 32)).astype(np.float32)
    want = _greedy_reference(lm, params, prompt, 5)

    engine = LLMEngine(lm, params, num_slots=2, max_len=256,
                       dtype=jnp.float32, prefill_chunk=32)
    req = Request(request_id=0, input_embeds=prompt, max_new_tokens=5)
    engine.generate([req])
    assert req.output_ids == want, (req.output_ids, want)


def test_kv_cache_grows_on_demand(lm_and_params):
    """The cache starts small (occupancy-proportional memory, the paged-KV
    role) and doubles only when a live sequence needs it — same tokens out."""
    from funasr_tpu.llm.engine import LLMEngine, Request
    lm, params = lm_and_params
    rng = np.random.default_rng(5)
    prompt = rng.standard_normal((100, 32)).astype(np.float32)
    want = _greedy_reference(lm, params, prompt, 4)

    engine = LLMEngine(lm, params, num_slots=2, max_len=512,
                       dtype=jnp.float32, prefill_chunk=64, init_cache_len=32)
    assert engine.cache_len == 32
    req = Request(request_id=0, input_embeds=prompt, max_new_tokens=4)
    engine.generate([req])
    assert req.output_ids == want, (req.output_ids, want)
    assert engine.n_cache_grows >= 1
    assert engine.cache_len >= 104
    assert engine.cache_len <= 256  # grew to the bucket, not to max_len


def test_seeded_sampling_reproducible(lm_and_params):
    """temperature>0 sampling is reproducible for a given engine seed and
    request id (the round-2 advisor flagged fresh unseeded rngs per token)."""
    from funasr_tpu.llm.engine import LLMEngine, Request
    lm, params = lm_and_params
    rng = np.random.default_rng(6)
    prompt = rng.standard_normal((10, 32)).astype(np.float32)

    def run(seed):
        engine = LLMEngine(lm, params, num_slots=2, max_len=128,
                           dtype=jnp.float32, seed=seed)
        req = Request(request_id=7, input_embeds=prompt, max_new_tokens=8,
                      temperature=1.0)
        engine.generate([req])
        return req.output_ids

    a, b, c = run(0), run(0), run(1)
    assert a == b, (a, b)
    assert a != c or True  # different seeds usually differ; equality is legal


def test_prefix_cache_hits_and_matches(lm_and_params):
    """Requests sharing a ChatML-style prefix: the second one reuses the
    cached KV rows (n_prefix_hits) and still decodes exactly the same tokens
    as the reference full-recompute decode (K/V rows are per-position
    projections, so reuse is bit-exact)."""
    from funasr_tpu.llm.engine import LLMEngine, Request
    lm, params = lm_and_params
    rng = np.random.default_rng(7)
    n_new = 5
    prefix = rng.standard_normal((12, 32)).astype(np.float32)
    tails = [rng.standard_normal((n, 32)).astype(np.float32) for n in (6, 9, 3)]
    prompts = [np.concatenate([prefix, t], axis=0) for t in tails]
    want = [_greedy_reference(lm, params, p, n_new) for p in prompts]

    engine = LLMEngine(lm, params, num_slots=1, max_len=64, dtype=jnp.float32,
                       prefill_chunk=32)
    for i, p in enumerate(prompts):
        req = Request(request_id=i, input_embeds=p, max_new_tokens=n_new,
                      prefix_len=prefix.shape[0])
        engine.generate([req])
        assert req.output_ids == want[i], (i, req.output_ids, want[i])
    assert engine.n_prefix_hits == len(prompts) - 1
    assert len(engine.prefix_cache) == 1


def test_prefix_cache_distinct_prefixes_no_false_hit(lm_and_params):
    """Different prefixes must not collide; short prefixes are not cached."""
    from funasr_tpu.llm.engine import LLMEngine, Request
    lm, params = lm_and_params
    rng = np.random.default_rng(8)
    engine = LLMEngine(lm, params, num_slots=1, max_len=64, dtype=jnp.float32)
    a = rng.standard_normal((20, 32)).astype(np.float32)
    b = rng.standard_normal((20, 32)).astype(np.float32)
    wa = _greedy_reference(lm, params, a, 4)
    wb = _greedy_reference(lm, params, b, 4)
    ra = Request(request_id=0, input_embeds=a, max_new_tokens=4, prefix_len=10)
    rb = Request(request_id=1, input_embeds=b, max_new_tokens=4, prefix_len=10)
    rc = Request(request_id=2, input_embeds=b, max_new_tokens=4, prefix_len=4)
    engine.generate([ra]); engine.generate([rb]); engine.generate([rc])
    assert ra.output_ids == wa and rb.output_ids == wb and rc.output_ids == wb
    assert engine.n_prefix_hits == 0
    assert len(engine.prefix_cache) == 2


def test_device_prompt_batch_matches_host_path(lm_and_params):
    """submit_prompt_batch (device-resident prompts, in-program slicing)
    decodes the same tokens as host-numpy Request prompts."""
    from funasr_tpu.llm.engine import LLMEngine, Request
    lm, params = lm_and_params
    rng = np.random.default_rng(7)
    n_new = 6
    lens = [9, 5, 12]
    t_max = max(lens)
    buf = np.zeros((3, t_max, 32), np.float32)
    prompts = []
    for i, L in enumerate(lens):
        p = rng.standard_normal((L, 32)).astype(np.float32)
        prompts.append(p)
        buf[i, :L] = p

    host = LLMEngine(lm, params, num_slots=4, max_len=64, dtype=jnp.float32)
    host_reqs = [Request(request_id=i, input_embeds=p, max_new_tokens=n_new)
                 for i, p in enumerate(prompts)]
    host.generate(host_reqs)

    dev = LLMEngine(lm, params, num_slots=4, max_len=64, dtype=jnp.float32)
    dev_reqs = dev.submit_prompt_batch(jnp.asarray(buf), np.asarray(lens),
                                       max_new_tokens=n_new)
    while any(not r.done for r in dev_reqs):
        if not dev.step():
            break
    for h, d in zip(host_reqs, dev_reqs):
        assert h.output_ids == d.output_ids, (h.output_ids, d.output_ids)


def test_device_prompt_batch_multichunk(lm_and_params):
    """Device prompts longer than prefill_chunk prefill in several in-program
    slices and still match the host path."""
    from funasr_tpu.llm.engine import LLMEngine, Request
    lm, params = lm_and_params
    rng = np.random.default_rng(11)
    n_new = 4
    lens = [70, 40]
    buf = np.zeros((2, 70, 32), np.float32)
    prompts = []
    for i, L in enumerate(lens):
        p = rng.standard_normal((L, 32)).astype(np.float32)
        prompts.append(p)
        buf[i, :L] = p

    host = LLMEngine(lm, params, num_slots=2, max_len=128, dtype=jnp.float32,
                     prefill_chunk=32)
    host_reqs = [Request(request_id=i, input_embeds=p, max_new_tokens=n_new)
                 for i, p in enumerate(prompts)]
    host.generate(host_reqs)

    dev = LLMEngine(lm, params, num_slots=2, max_len=128, dtype=jnp.float32,
                    prefill_chunk=32)
    dev_reqs = dev.submit_prompt_batch(jnp.asarray(buf), np.asarray(lens),
                                       max_new_tokens=n_new)
    while any(not r.done for r in dev_reqs):
        if not dev.step():
            break
    for h, d in zip(host_reqs, dev_reqs):
        assert h.output_ids == d.output_ids, (h.output_ids, d.output_ids)
