"""Fun-ASR-Nano round-2 depth: converter (incl. LoRA merge), audio-path parity,
LLM fine-tune forward, CTC timestamp branch."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")]
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")
from conftest import stub_reference_deps  # noqa: E402

stub_reference_deps()

ENC_CONF = dict(output_size=32, attention_heads=4, linear_units=64, num_blocks=2,
                input_layer="pe", kernel_size=11, sanm_shfit=0, dropout_rate=0.0)
LLM_CONF = dict(hidden_size=48, intermediate_size=96, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2, vocab_size=160,
                head_dim=12, rms_norm_eps=1e-6, rope_theta=10000.0,
                tie_word_embeddings=True, qkv_bias=False, qk_norm=True)


def _ref_state_dict():
    torch.manual_seed(31)
    from funasr.models.sanm.encoder import SANMEncoder as RefEnc
    from funasr.models.llm_asr.adaptor import Linear as RefLinear
    from transformers import Qwen3Config, Qwen3ForCausalLM

    enc = RefEnc(input_size=80, **ENC_CONF)
    ada = RefLinear(downsample_rate=2, encoder_dim=32, llm_dim=48, ffn_dim=64)
    qwen_cfg = Qwen3Config(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=160,
        head_dim=12, tie_word_embeddings=True)
    llm = Qwen3ForCausalLM(qwen_cfg)
    ctc_ada = RefLinear(downsample_rate=1, encoder_dim=32, llm_dim=32,
                        ffn_dim=64)
    ctc_lo = torch.nn.Linear(32, 40)
    sd = {}
    for prefix, mod in (("audio_encoder", enc), ("audio_adaptor", ada),
                        ("llm", llm), ("ctc_decoder", ctc_ada)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    sd["ctc.ctc_lo.weight"] = ctc_lo.weight
    sd["ctc.ctc_lo.bias"] = ctc_lo.bias
    return sd, enc, ada


def _build_mine():
    from funasr_tpu.models.fun_asr_nano.model import FunASRNano
    return FunASRNano(
        input_size=80, audio_encoder="SANMEncoder",
        audio_encoder_conf=dict(ENC_CONF),
        audio_adaptor="Linear",
        audio_adaptor_conf=dict(downsample_rate=2, encoder_dim=32, llm_dim=48,
                                ffn_dim=64),
        llm_conf=dict(LLM_CONF),
        ctc_decoder="Linear",
        ctc_decoder_conf=dict(downsample_rate=1, encoder_dim=32, llm_dim=32,
                              ffn_dim=64),
        ctc_conf=dict(ctc_vocab_size=40), ctc_weight=0.3)


def test_nano_converter_audio_path_parity(rng):
    """Converted audio encoder + adaptor reproduce the torch audio-embedding
    path (the exact tensors fed into the LLM)."""
    sd, enc, ada = _ref_state_dict()
    mine = _build_mine()
    from funasr_tpu.convert.torch_to_jax import convert_state_dict
    params = convert_state_dict(sd, mine, "FunASRNano")

    speech = rng.standard_normal((2, 30, 80)).astype(np.float32)
    lens = np.asarray([30, 22], np.int32)
    with torch.no_grad():
        e, el, _ = enc(torch.from_numpy(speech), torch.from_numpy(lens))
        want = ada(e).numpy()
    import jax.numpy as jnp
    got, got_lens = mine.encode_audio(params, jnp.asarray(speech),
                                      jnp.asarray(lens))
    n = min(got.shape[1], want.shape[1])
    for b_i, l in enumerate(np.asarray(got_lens)):
        np.testing.assert_allclose(np.asarray(got)[b_i, : min(l, n)],
                                   want[b_i, : min(l, n)], rtol=3e-4, atol=3e-4)


def test_nano_lora_merge():
    from funasr_tpu.convert.torch_to_jax import merge_lora_weights

    w = torch.randn(8, 6)
    a = torch.randn(2, 6)
    b = torch.randn(8, 2)
    sd = {
        "llm.base_model.model.model.layers.0.self_attn.q_proj.base_layer.weight": w,
        "llm.base_model.model.model.layers.0.self_attn.q_proj.lora_A.default.weight": a,
        "llm.base_model.model.model.layers.0.self_attn.q_proj.lora_B.default.weight": b,
        "other.weight": torch.randn(3, 3),
    }
    out = merge_lora_weights(sd)
    key = "llm.model.layers.0.self_attn.q_proj.weight"
    assert key in out
    np.testing.assert_allclose(np.asarray(out[key]),
                               (w + b @ a).numpy(), rtol=1e-5, atol=1e-5)
    assert not any("lora" in k for k in out)


def test_nano_forward_jit_and_ctc_timestamps(rng):
    import jax
    import jax.numpy as jnp
    sd, _, _ = _ref_state_dict()
    mine = _build_mine()
    from funasr_tpu.convert.torch_to_jax import convert_state_dict
    params = convert_state_dict(sd, mine, "FunASRNano")

    speech = jnp.asarray(rng.standard_normal((2, 24, 80)), jnp.float32)
    slens = jnp.asarray([24, 18], jnp.int32)
    text = jnp.asarray(rng.integers(3, 40, (2, 5)), jnp.int32)
    tlens = jnp.asarray([5, 4], jnp.int32)

    def loss_fn(p):
        return mine.forward_jit(p, speech, slens, text, tlens)[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gn = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                            for g in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gn) and gn > 0

    # CTC branch: log-probs over the ctc vocab + timestamp structure
    logp, lens = mine.ctc_branch(params, np.asarray(speech), np.asarray(slens))
    assert logp.shape[-1] == 40 and int(lens[0]) > 0

    class CtcTok:
        def decode(self, ids):
            return "".join(chr(ord("一") + int(i)) for i in ids)

        def encode(self, text):
            return [ord(c) - ord("一") for c in text]

    from funasr_tpu.ops.ctc_align import ctc_forced_align
    x = logp[0, : int(lens[0])]
    ids = np.asarray([5, 7], np.int64)
    path = ctc_forced_align(x, ids, x.shape[0], 2, blank_id=0)
    assert set(np.unique(path)) <= {0, 5, 7}


def test_vllm_gating():
    from funasr_tpu.auto.auto_model_vllm import check_vllm_applicable

    assert check_vllm_applicable("FunASRNano")
    assert check_vllm_applicable("LLMASRNAR")
    with pytest.raises(ValueError, match="CIF"):
        check_vllm_applicable("SeacoParaformer")
    with pytest.raises(ValueError, match="punctuation"):
        check_vllm_applicable("CTTransformerStreaming")
    assert not check_vllm_applicable("SomethingUnknown")


def test_glm_asr_distinct_pipeline(rng):
    """GLMASR is a real pipeline (whisper-style encoder + GLM chat template),
    not a registration alias: it builds, prompts differently from LLMASR, and
    decodes end-to-end."""
    import jax
    import funasr_tpu  # noqa: F401
    from funasr_tpu.models.llm_asr.model import GLMASR, LLMASR

    glm = GLMASR(
        input_size=80,
        audio_encoder_conf=dict(output_size=32, attention_heads=4,
                                linear_units=64, num_blocks=2,
                                input_layer="conv2d"),
        audio_adaptor_conf=dict(downsample_rate=2, encoder_dim=32, llm_dim=48,
                                ffn_dim=64),
        llm_conf=dict(LLM_CONF))
    params = glm.init_params(jax.random.PRNGKey(0))

    class Tok:
        def encode(self, s):
            return [hash(c) % 150 + 3 for c in s][:12]

        def decode(self, ids):
            return "".join(chr(ord("a") + (int(i) % 26)) for i in ids)

    pre_glm, suf_glm = glm.build_chatml_ids(Tok(), glm.get_prompt())
    llm_generic = LLMASR.__new__(LLMASR)
    llm_generic.prompt_template = "Transcribe the speech to text:"
    assert glm.get_prompt() != llm_generic.get_prompt()

    from funasr_tpu.frontends.wav_frontend import WavFrontend
    frontend = WavFrontend(fs=16000, lfr_m=1, lfr_n=1, n_mels=80, dither=0.0)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    res, _ = glm.inference(params, wav, tokenizer=Tok(), frontend=frontend,
                           max_new_tokens=4, num_slots=2, max_model_len=256)
    assert "text" in res[0]


def test_vllm_streaming_generate(rng):
    """AutoModelVLLM.streaming_generate (reference
    inference_vllm_streaming:190-328): prefix-window chunks yield
    incrementally, partials trim rollback_chars into fixed_text, the last
    chunk is final with the full-window transcript."""
    import jax
    import funasr_tpu  # noqa: F401
    from funasr_tpu.auto.auto_model_vllm import AutoModelVLLM
    from funasr_tpu.frontends.wav_frontend import WavFrontend
    from funasr_tpu.models.fun_asr_nano.model import FunASRNano

    model = FunASRNano(
        input_size=80,
        audio_encoder_conf=dict(output_size=32, attention_heads=4,
                                linear_units=64, num_blocks=2),
        audio_adaptor_conf=dict(downsample_rate=2, encoder_dim=32, llm_dim=48,
                                ffn_dim=64),
        llm_conf=dict(LLM_CONF))
    params = model.init_params(jax.random.PRNGKey(0))

    class Tok:
        def encode(self, s):
            return [hash(c) % 150 + 3 for c in s][:12]

        def decode(self, ids):
            return "".join(chr(ord("a") + (int(i) % 26)) for i in ids)

    am = AutoModelVLLM.__new__(AutoModelVLLM)
    am.model, am.params = model, params
    am.num_slots, am.max_model_len, am.tensor_parallel_size = 2, 256, 1
    am.kwargs = {"tokenizer": Tok(),
                 "frontend": WavFrontend(fs=16000, lfr_m=1, lfr_n=1,
                                         n_mels=80, dither=0.0)}

    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)  # 1 s
    chunks = list(am.streaming_generate(wav, chunk_ms=400, rollback_chars=2,
                                        max_new_tokens=6, num_slots=2,
                                        max_model_len=256))
    assert len(chunks) == 3  # 1 s / 400 ms prefix windows
    assert [c["chunk_idx"] for c in chunks] == [1, 2, 3]
    assert [c["is_final"] for c in chunks] == [False, False, True]
    assert chunks[0]["audio_duration_ms"] == 400.0
    assert chunks[-1]["audio_duration_ms"] == 1000.0
    for c in chunks[:-1]:
        assert c["fixed_text"] == c["text"][: max(len(c["text"]) - 2, 0)]
    assert chunks[-1]["fixed_text"] == chunks[-1]["text"]


def test_vllm_streaming_two_stage_prev_text(rng):
    """Past 10 chunks the SDK switches to stage 2: remaining windows decode
    as continuations of the stable stage-1 text, and every stage-2 result is
    prefixed by it (reference inference_vllm_streaming.py:291-328)."""
    import jax
    import funasr_tpu  # noqa: F401
    from funasr_tpu.auto.auto_model_vllm import AutoModelVLLM
    from funasr_tpu.frontends.wav_frontend import WavFrontend
    from funasr_tpu.models.fun_asr_nano.model import FunASRNano

    model = FunASRNano(
        input_size=80,
        audio_encoder_conf=dict(output_size=32, attention_heads=4,
                                linear_units=64, num_blocks=2),
        audio_adaptor_conf=dict(downsample_rate=2, encoder_dim=32, llm_dim=48,
                                ffn_dim=64),
        llm_conf=dict(LLM_CONF))
    params = model.init_params(jax.random.PRNGKey(0))

    class Tok:
        def encode(self, s):
            return [hash(c) % 150 + 3 for c in s][:12]

        def decode(self, ids):
            return "".join(chr(ord("a") + (int(i) % 26)) for i in ids)

    am = AutoModelVLLM.__new__(AutoModelVLLM)
    am.model, am.params = model, params
    am.num_slots, am.max_model_len, am.tensor_parallel_size = 2, 256, 1
    am.kwargs = {"tokenizer": Tok(),
                 "frontend": WavFrontend(fs=16000, lfr_m=1, lfr_n=1,
                                         n_mels=80, dither=0.0)}

    wav = (rng.standard_normal(4800 * 16) * 0.1).astype(np.float32)  # 4.8 s
    chunks = list(am.streaming_generate(wav, chunk_ms=400, rollback_chars=2,
                                        max_new_tokens=4, num_slots=2,
                                        max_model_len=256))
    assert len(chunks) == 12 and chunks[-1]["is_final"]
    stage1 = chunks[:10]
    best = max((c["text"] for c in stage1 if c["text"].strip()),
               key=len, default="")
    prev = best[:-2] if len(best) > 2 else best
    for c in chunks[10:]:
        assert c["text"].startswith(prev), (prev, c["text"])
        if not c["is_final"]:
            assert c["fixed_text"].startswith(prev) or c["fixed_text"] == prev
