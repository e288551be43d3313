"""Model-zoo TPU throughput benches beyond the bench.py headline.

Covers the reference's other headline rows (BASELINE.md / reference
``README.md:313-319``):

- ``sensevoice``: SenseVoice-Small batched offline CTC decode — reference
  H100 RTFx 170x, CPU 17x.
- ``nano``: Fun-ASR-Nano (SAN-M audio encoder + Linear adaptor + Qwen3-0.6B
  LLM) batched serving through the continuous-batching LLMEngine — the
  vLLM-path twin (reference ``docs/vllm_guide.md:9-16``, H100 RTFx 340x).

Random-init production-shape weights, synthetic 15 s utterances (the shape
the AutoModel ``batch_size_s`` batcher emits); RTFx = audio_s / wall_s
(reference ``docs/benchmark/rtf_reproducibility.md:8-28``). Run on one TPU
chip:

    python benchmarks/bench_zoo.py sensevoice
    python benchmarks/bench_zoo.py nano
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    # device->host copy is the only reliable completion fence on the tunneled
    # platform (block_until_ready can return early there)
    return np.asarray(x)


def bench_sensevoice(batch: int = 32, secs: float = 15.0, quant: str = None):
    from funasr_tpu.core.module import cast_floats
    from funasr_tpu.models.sense_voice.model import SenseVoiceSmall
    from funasr_tpu.ops.fbank import fbank_batch
    from funasr_tpu.ops.lfr import apply_cmvn, apply_lfr_batch

    # production shape (reference SenseVoiceSmall config.yaml: 50 SAN-M
    # blocks + 20 tp blocks, d=512, ffn 2048, multilingual bpe vocab 25055)
    model = SenseVoiceSmall(
        input_size=560, vocab_size=25055, blank_id=0,
        encoder_conf=dict(output_size=512, attention_heads=4,
                          linear_units=2048, num_blocks=50, tp_blocks=20,
                          kernel_size=11))
    params = cast_floats(model.init_params(jax.random.PRNGKey(0)),
                         jnp.bfloat16)
    if quant == "w8a8":
        # SAN-M stack shares linear_apply with Paraformer, so the W8A8
        # serving recipe (docs/benchmarks.md) applies unchanged
        from funasr_tpu.ops.quant import quantize_params_int8
        params = quantize_params_int8(params, mode="w8a8")

    fs, n = 16000, int(secs * 16000)
    rng = np.random.default_rng(0)
    waves = jnp.asarray(rng.standard_normal((batch, n)) * 0.1, jnp.float32)
    wlens = jnp.full((batch,), n, jnp.int32)
    cm = jnp.zeros((560,), jnp.float32)
    ci = jnp.full((560,), 0.1, jnp.float32)
    t_lfr = -(-(1 + (n - 400) // 160) // 6)
    t_pad = -(-t_lfr // 128) * 128
    lid = jnp.zeros((batch,), jnp.int32)
    tn = jnp.zeros((batch,), jnp.int32)

    @jax.jit
    def pipeline(params, waves, wlens):
        feats, flens = fbank_batch(waves * 32768.0, wlens)
        feats, flens = apply_lfr_batch(feats, flens, 7, 6)
        feats = apply_cmvn(feats, cm, ci)
        feats = jnp.pad(feats, ((0, 0), (0, t_pad - feats.shape[1]), (0, 0)))
        yseq, out_lens, _ = model.infer_jit(
            params, feats.astype(jnp.bfloat16), flens, lid, tn)
        return yseq, out_lens

    _fetch(pipeline(params, waves, wlens)[0])  # compile + warm
    iters, best = 10, float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = pipeline(params, waves, wlens)
        _fetch(out[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    rtfx = batch * secs / best
    return {"metric": "sensevoice_small_offline_rtfx_1chip",
            "value": round(rtfx, 1), "unit": "x_realtime",
            "vs_baseline": round(rtfx / 170.0, 2)}


def bench_nano(batch: int = 16, secs: float = 15.0, new_tokens: int = 64,
               quant: str = None):
    from funasr_tpu.core.module import cast_floats
    from funasr_tpu.models.fun_asr_nano.model import FunASRNano

    # production shape: Paraformer-large SAN-M encoder (50x512) + Linear
    # adaptor + Qwen3-0.6B decoder (QwenConfig defaults)
    model = FunASRNano(
        audio_encoder="SANMEncoder",
        audio_encoder_conf=dict(output_size=512, attention_heads=4,
                                linear_units=2048, num_blocks=50,
                                kernel_size=11, sanm_shfit=0),
        input_size=560)
    params = cast_floats(model.init_params(jax.random.PRNGKey(0)),
                         jnp.bfloat16)
    if quant == "int8":
        # weight-only int8 LLM decode (the memory-bound stage): 213 -> 238x
        from funasr_tpu.ops.quant import quantize_params_int8
        params = dict(params)
        params["llm"] = quantize_params_int8(params["llm"])

    t_lfr = -(-(1 + (int(secs * 16000) - 400) // 160) // 6)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((batch, t_lfr, 560)) * 0.3,
                        jnp.bfloat16)
    flens = jnp.full((batch,), t_lfr, jnp.int32)

    encode = jax.jit(lambda p, s, l: model.encode_audio(p, s, l))
    a0, al0 = encode(params, feats, flens)
    audio_lens = np.asarray(al0)

    def run_once():
        # device-resident prompt handoff: the encoder output feeds the LLM
        # engine without a host round-trip (engine.submit_prompt_batch), the
        # TPU twin of vLLM's on-GPU prompt_embeds path
        engine = model.engine(params, num_slots=batch, max_len=512)
        t0 = time.perf_counter()
        a, al = encode(params, feats, flens)
        reqs = engine.submit_prompt_batch(a, audio_lens,
                                          max_new_tokens=new_tokens)
        while any(not r.done for r in reqs):
            if not engine.step():
                break
        return time.perf_counter() - t0

    run_once()  # compile/warm (engine programs + prefill shapes)
    best = min(run_once() for _ in range(3))
    rtfx = batch * secs / best
    toks = batch * new_tokens / best
    return {"metric": "fun_asr_nano_llm_serving_rtfx_1chip",
            "value": round(rtfx, 1), "unit": "x_realtime",
            "vs_baseline": round(rtfx / 340.0, 2),
            "decode_tok_s": round(toks, 1)}


def bench_whisper(batch: int = 8, new_tokens: int = 48):
    """whisper-large-v3, 30 s padded windows (the model's fixed receptive
    field) — reference contrast row RTFx 13x on H100 (``README.md:319``)."""
    from funasr_tpu.core.module import cast_floats
    from funasr_tpu.models.whisper.model import WhisperModel

    model = WhisperModel(whisper_size="whisper-large-v3")
    params = cast_floats(model.init_params(jax.random.PRNGKey(0)),
                         jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((batch, 3000, 128)) * 0.3,
                      jnp.bfloat16)  # encode() takes time-major (B, T, mels)
    prompt = [50258, 50260, 50360, 50365]  # sot/lang/transcribe/no-ts
    encode = jax.jit(lambda p, m: model.encode(p, m))

    def run_once():
        t0 = time.perf_counter()
        enc, _ = encode(params, mel)
        out = model.greedy_decode(params, enc, prompt, eot_id=50257,
                                  max_new=new_tokens)
        assert len(out) == batch
        return time.perf_counter() - t0

    run_once()  # compile (encoder + cross-kv + cached step)
    best = min(run_once() for _ in range(3))
    rtfx = batch * 30.0 / best
    return {"metric": "whisper_large_v3_offline_rtfx_1chip",
            "value": round(rtfx, 1), "unit": "x_realtime",
            "vs_baseline": round(rtfx / 13.0, 2)}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "sensevoice"
    fn = {"sensevoice": bench_sensevoice, "nano": bench_nano,
          "whisper": bench_whisper}[mode]
    kwargs = {}
    if mode == "nano" and "int8" in sys.argv[2:]:
        kwargs["quant"] = "int8"
    if mode == "sensevoice" and "w8a8" in sys.argv[2:]:
        kwargs["quant"] = "w8a8"
    print(json.dumps(fn(**kwargs)))


if __name__ == "__main__":
    main()
