"""Per-stage FLOPs + MFU accounting for the Paraformer-large offline pipeline.

Times each pipeline stage as its own jitted program on one TPU chip, pairs the
wall time with analytic FLOP counts (multiply-add = 2 FLOP), and reports MFU
against the chip's matmul peak: v5e ≈ 197 TFLOP/s bf16, ≈ 394 TOP/s int8.

This answers the "is 13k RTFx the roofline?" question quantitatively: the
breakdown shows which stages are MXU-bound (encoder/decoder — candidates for
the W8A8 int8 path) and which are VPU/bandwidth-bound (frontend, CIF), where
more FLOP/s would not help.

Run: python benchmarks/bench_mfu.py            (bf16 + w8a8 serving modes)

Reference context: the reference publishes RTFx only (``docs/benchmark/
rtf_reproducibility.md:8-28``); MFU accounting is our extension.
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

PEAK_BF16 = 197e12  # v5e MXU peak, bf16 FLOP/s
PEAK_INT8 = 394e12  # v5e MXU peak, int8 OP/s

PROD_CONF = dict(
    input_size=560, vocab_size=8404,
    encoder_conf=dict(output_size=512, attention_heads=4, linear_units=2048,
                      num_blocks=50, kernel_size=11, sanm_shfit=0,
                      dropout_rate=0.0),
    decoder_conf=dict(attention_heads=16, linear_units=2048, num_blocks=16,
                      att_layer_num=16, kernel_size=11, sanm_shfit=0),
    predictor_conf=dict(idim=512, l_order=1, r_order=1, tail_threshold=0.45),
    sos=1, eos=2, predictor_bias=1)


# ---------------------------------------------------------------------------
# analytic FLOPs (d=512, ffn=2048, kernel 11, vocab 8404 from PROD_CONF)
# ---------------------------------------------------------------------------

def encoder_flops(b, t, d=512, ffn=2048, k=11, d_in=560, blocks=50):
    def block(din):
        qkv = 2 * b * t * din * 3 * d
        attn = 4 * b * t * t * d          # QK^T + attn@V
        out = 2 * b * t * d * d
        fsmn = 2 * b * t * d * k
        f = 2 * (2 * b * t * d * ffn)     # w_1 + w_2
        return qkv + attn + out + fsmn + f
    return block(d_in) + (blocks - 1) * block(d)


def predictor_flops(b, t, d=512, k=3):
    return 2 * b * t * k * d * d + 2 * b * t * d


def decoder_flops(b, kq, t, d=512, ffn=2048, kern=11, vocab=8404, att_layers=16):
    per = (2 * b * kq * d * d            # linear_q
           + 2 * b * t * d * 2 * d       # linear_k_v over memory
           + 4 * b * kq * t * d          # scores + ctx
           + 2 * b * kq * d * d          # linear_out
           + 2 * b * kq * d * kern       # self FSMN
           + 2 * (2 * b * kq * d * ffn))  # FFN
    d3 = 2 * b * kq * d * kern + 2 * (2 * b * kq * d * ffn)
    out = 2 * b * kq * d * vocab
    return att_layers * per + d3 + out


def frontend_flops(b, frames, nfft=512, nbins=257, mels=80, win=400):
    per_frame = (2.5 * nfft * np.log2(nfft)   # rfft (split-radix estimate)
                 + 2 * nbins * mels           # mel matmul
                 + 6 * win)                   # dither/dc/preemph/window
    return int(b * frames * per_frame)


def bench(fn, *args, iters=10, windows=4):
    # stage programs return a SCALAR (sum-reduced inside jit): fetching a full
    # activation tensor through the device tunnel costs more than the stage
    # itself and would swamp the timing. The scalar fetch is the completion
    # fence (block_until_ready can return early on the tunneled platform).
    out = fn(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    from funasr_tpu.core.module import cast_floats
    from funasr_tpu.models.paraformer.model import Paraformer
    from funasr_tpu.ops.lfr import apply_cmvn, apply_lfr_batch
    from funasr_tpu.ops.fbank import fbank_batch
    from funasr_tpu.ops.quant import quantize_params_int8

    batch, secs, fs = 32, 15.0, 16000
    n = int(secs * fs)
    model = Paraformer(**PROD_CONF)
    params = cast_floats(model.init_params(jax.random.PRNGKey(0)), jnp.bfloat16)
    params_q = quantize_params_int8(params, mode="w8a8")

    rng = np.random.default_rng(0)
    waves = jnp.asarray(rng.standard_normal((batch, n)) * 0.1, jnp.float32)
    wlens = jnp.full((batch,), n, jnp.int32)
    cmvn_means = jnp.zeros((560,), jnp.float32)
    cmvn_istd = jnp.full((560,), 0.1, jnp.float32)
    frames = 1 + (n - 400) // 160
    t_lfr = -(-frames // 6)
    t_pad = -(-t_lfr // 128) * 128
    max_tok = t_lfr // 2

    def frontend_fn(waves, wlens):
        feats, flens = fbank_batch(waves * 32768.0, wlens)
        feats, flens = apply_lfr_batch(feats, flens, 7, 6)
        feats = apply_cmvn(feats, cmvn_means, cmvn_istd)
        feats = jnp.pad(feats, ((0, 0), (0, t_pad - feats.shape[1]), (0, 0)))
        return feats.astype(jnp.bfloat16), flens

    stage_frontend = jax.jit(frontend_fn)

    # timed variants reduce to a scalar inside the program (see bench())
    @jax.jit
    def t_frontend(waves, wlens):
        feats, _ = frontend_fn(waves, wlens)
        return jnp.sum(feats.astype(jnp.float32))

    @jax.jit
    def t_encoder(p, feats, flens):
        enc, _ = model.encode(p, feats, flens)
        return jnp.sum(enc.astype(jnp.float32))

    @jax.jit
    def t_predictor(p, enc, enc_lens):
        pae, ptl, alphas, peaks = model.calc_predictor(p, enc, enc_lens,
                                                       max_tok)
        return jnp.sum(pae.astype(jnp.float32)) + jnp.sum(ptl)

    @jax.jit
    def t_decoder(p, enc, enc_lens, pae, tl):
        dec, _ = model.cal_decoder_with_predictor(p, enc, enc_lens, pae, tl)
        return jnp.sum(jnp.argmax(dec, -1))

    feats, flens = stage_frontend(waves, wlens)
    rows = []
    for mode, p in (("bf16", params), ("w8a8", params_q)):
        enc, enc_lens = jax.jit(model.encode)(p, feats, flens)
        pae, ptl, _, _ = jax.jit(model.calc_predictor, static_argnums=3)(
            p, enc, enc_lens, max_tok)
        tl = jnp.clip(jnp.round(ptl).astype(jnp.int32), 0, pae.shape[1])
        stages = [
            # the frontend is VPU/bandwidth-bound, not MXU-bound: report its
            # achieved TFLOP/s only (peak=None) — an MFU% against the matmul
            # peak would not be meaningful
            ("frontend", t_frontend, (waves, wlens),
             frontend_flops(batch, frames), None),
            ("encoder", t_encoder, (p, feats, flens),
             encoder_flops(batch, t_pad),
             PEAK_INT8 if mode == "w8a8" else PEAK_BF16),
            ("predictor", t_predictor, (p, enc, enc_lens),
             predictor_flops(batch, t_pad), PEAK_BF16),
            ("decoder", t_decoder, (p, enc, enc_lens, pae, tl),
             decoder_flops(batch, pae.shape[1], t_pad),
             PEAK_INT8 if mode == "w8a8" else PEAK_BF16),
        ]
        if mode == "w8a8":
            stages = stages[1:]  # frontend has no quantized weights
        for name, fn, args, flops, peak in stages:
            dt = bench(fn, *args)
            row = {
                "stage": f"{name}[{mode}]", "ms": round(dt * 1e3, 2),
                "gflop": round(flops / 1e9, 1),
                "tflops": round(flops / dt / 1e12, 1),
            }
            if peak is not None:
                row["mfu_pct"] = round(100 * flops / dt / peak, 1)
            rows.append(row)

    for r in rows:
        print(json.dumps(r))
    # same decoder token count (pae.shape[1]) as the per-stage row, so the
    # total is the sum of the stage GFLOPs
    total_flops = (frontend_flops(batch, frames) + encoder_flops(batch, t_pad)
                   + predictor_flops(batch, t_pad)
                   + decoder_flops(batch, pae.shape[1], t_pad))
    print(json.dumps({"total_gflop_per_batch": round(total_flops / 1e9, 1),
                      "audio_seconds_per_batch": batch * secs}))


if __name__ == "__main__":
    main()
