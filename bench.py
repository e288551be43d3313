"""Headline benchmark: Paraformer-large batched offline ASR throughput (RTFx).

Measures the full device pipeline — waveform -> kaldi fbank -> LFR6 -> CMVN -> 50-block
SAN-M encoder -> CIF -> 16-block NAR decoder -> greedy tokens — on one TPU chip in
bf16, batch-16 x 15 s utterances (the shape the AutoModel ``batch_size_s`` batcher
produces after VAD segmentation).

RTFx = audio_seconds / wall_seconds (reference definition,
``docs/benchmark/rtf_reproducibility.md:8-28``). Baseline: Paraformer-large GPU RTFx
120x on H100 (reference ``README.md:317``; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os as _os
import time

if _os.environ.get("JAX_PLATFORMS") not in (None, "", "cpu"):
    # A stale pinned platform name (e.g. a renamed TPU plugin) would make
    # backend init fail outright; verify it resolves in a throwaway
    # interpreter and fall back to auto-discovery if it doesn't. The device
    # tunnel can also WEDGE (jax.devices() blocks uninterruptibly), so the
    # probe runs in a killable subprocess and retries for a bounded window —
    # a wedged tunnel must fail this script loudly, not hang it forever.
    import subprocess as _sp
    import sys as _sys
    _attempts = int(_os.environ.get("BENCH_PROBE_ATTEMPTS", 6))
    for _i in range(_attempts):
        try:
            _r = _sp.run([_sys.executable, "-c", "import jax; jax.devices()"],
                         capture_output=True, timeout=300)
        except _sp.TimeoutExpired:  # wedged: child killed, retry
            continue
        if _r.returncode == 0:
            break  # platform resolves; proceed pinned
        _os.environ["JAX_PLATFORMS"] = ""  # renamed plugin: auto-discover
        break
    else:
        print(json.dumps({"metric": "paraformer_large_offline_rtfx_1chip",
                          "value": 0.0, "unit": "x_realtime",
                          "vs_baseline": 0.0,
                          "error": "device tunnel unresponsive after "
                                   f"{_attempts}x300s probes"}))
        raise SystemExit(3)

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RTFX = 120.0  # reference Paraformer-large GPU (H100) RTFx

PROD_CONF = dict(
    input_size=560, vocab_size=8404,
    encoder_conf=dict(output_size=512, attention_heads=4, linear_units=2048,
                      num_blocks=50, kernel_size=11, sanm_shfit=0,
                      dropout_rate=0.0),
    decoder_conf=dict(attention_heads=16, linear_units=2048, num_blocks=16,
                      att_layer_num=16, kernel_size=11, sanm_shfit=0),
    predictor_conf=dict(idim=512, l_order=1, r_order=1, tail_threshold=0.45),
    sos=1, eos=2, predictor_bias=1)


def main_automodel():
    """RTFx through the PUBLIC path — ``AutoModel.generate()`` end to end
    (waveform list -> frontend -> bucketed jit decode -> detokenize), the same
    route a user of the reference's production path takes
    (``funasr/auto/auto_model.py:683-838``). Proves the public API runs the
    same compiled-program regime as the raw pipeline below."""
    from funasr_tpu.auto.auto_model import AutoModel

    batch, secs, fs = int(_os.environ.get("BENCH_BATCH", 32)), 15.0, 16000
    n = int(secs * fs)
    token_list = (["<blank>", "<s>", "</s>"]
                  + [chr(0x4E00 + i) for i in range(8400)] + ["<unk>"])
    quant = ("w8a8" if _os.environ.get("BENCH_MODE", "bf16") == "w8a8"
             else None)
    am = AutoModel(
        model="Paraformer", model_conf={}, **PROD_CONF,
        frontend="WavFrontend",
        frontend_conf=dict(fs=fs, n_mels=80, lfr_m=7, lfr_n=6, cmvn_file=None,
                           dither=0.0),
        tokenizer="CharTokenizer", tokenizer_conf=dict(token_list=token_list),
        bf16=True, quant=quant)

    rng = np.random.default_rng(0)
    # PCM16 input — what production clients actually send; uploads half the
    # bytes of float32 and converts on device (bit-exact, tests/test_auto_model)
    waves = [np.asarray(rng.standard_normal(n) * 0.1 * 32767, np.int16)
             for _ in range(batch)]
    keys = [f"utt{i}" for i in range(batch)]

    res = am.generate(input=waves, key=keys, batch_size=batch)  # warm/compile
    assert len(res) == batch

    iters = 10
    best_dt = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(iters):
            res = am.generate(input=waves, key=keys, batch_size=batch)
        best_dt = min(best_dt, time.perf_counter() - t0)

    rtfx = batch * secs * iters / best_dt
    print(json.dumps({
        "metric": "paraformer_large_automodel_rtfx_1chip",
        "value": round(rtfx, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / BASELINE_RTFX, 2),
    }))


def main():
    from funasr_tpu.core.module import cast_floats
    from funasr_tpu.models.paraformer.model import Paraformer
    from funasr_tpu.ops.lfr import apply_cmvn, apply_lfr_batch
    from funasr_tpu.ops.fbank import fbank_batch

    import os
    batch, secs = int(os.environ.get("BENCH_BATCH", 32)), 15.0
    fs = 16000
    n = int(secs * fs)

    model = Paraformer(**PROD_CONF)
    params = cast_floats(model.init_params(jax.random.PRNGKey(0)), jnp.bfloat16)
    # serving default: bf16. W8A8 (MXU int8 at 2x bf16 peak) is OPT-IN via
    # BENCH_MODE=w8a8: the production-dims flip-rate study
    # (tests/test_w8a8_production.py, docs/benchmarks.md) showed w8a8's logit
    # perturbation is ~2x bf16 rounding — fine odds on a trained checkpoint's
    # wide argmax margins, but unprovable without one, and a serving DEFAULT
    # must not rest on unmeasurable accuracy. Revisit when real-checkpoint
    # CER lands (docs/real_checkpoints.md).
    mode = os.environ.get("BENCH_MODE", "bf16")
    if mode == "w8a8":
        from funasr_tpu.ops.quant import quantize_params_int8
        params = quantize_params_int8(params, mode="w8a8")

    rng = np.random.default_rng(0)
    waves = jnp.asarray(rng.standard_normal((batch, n)) * 0.1, jnp.float32)
    wlens = jnp.full((batch,), n, jnp.int32)
    cmvn_means = jnp.zeros((560,), jnp.float32)
    cmvn_istd = jnp.full((560,), 0.1, jnp.float32)

    t_lfr = -(-(1 + (n - 400) // 160) // 6)
    t_pad = -(-t_lfr // 128) * 128  # snap the encoder length to MXU-friendly tiles

    @jax.jit
    def pipeline(params, waves, wlens):
        feats, flens = fbank_batch(waves * 32768.0, wlens)
        feats, flens = apply_lfr_batch(feats, flens, 7, 6)
        feats = apply_cmvn(feats, cmvn_means, cmvn_istd)
        feats = jnp.pad(feats, ((0, 0), (0, t_pad - feats.shape[1]), (0, 0)))
        yseq, token_lens, score, _, _ = model.infer_jit(
            params, feats.astype(jnp.bfloat16), flens, max_tokens=t_lfr // 2)
        return yseq, token_lens

    # warmup/compile; fetch to host — on the axon platform block_until_ready
    # can return before execution finishes, so a device->host copy is the
    # only reliable completion barrier (device ops run in submission order,
    # so fetching the last output fences the whole loop)
    out = pipeline(params, waves, wlens)
    np.asarray(out[0])

    # best of 6 windows: the axon tunnel shares bandwidth with other tenants,
    # so single-window timings can be dragged down by unrelated traffic (the
    # r01->r02 "regression" was tunnel noise; more windows tighten the max)
    iters = 10
    best_dt = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = pipeline(params, waves, wlens)
        np.asarray(out[0])
        np.asarray(out[1])
        best_dt = min(best_dt, time.perf_counter() - t0)

    audio_seconds = batch * secs * iters
    rtfx = audio_seconds / best_dt
    print(json.dumps({
        "metric": "paraformer_large_offline_rtfx_1chip",
        "value": round(rtfx, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / BASELINE_RTFX, 2),
    }))


if __name__ == "__main__":
    import sys
    if "--via-automodel" in sys.argv:
        main_automodel()
    else:
        main()
