"""Training-step throughput bench: Paraformer-large fwd+bwd+adamw on one chip.

The reference publishes no training-throughput number; this records ours so
regressions are visible. Synthetic batch of 15 s utterances at the
production shape (50x512 SAN-M encoder, 16-block decoder — SURVEY 7.1),
label length 40. One jitted GSPMD step (``make_train_step``): loss, grads,
global-norm clip, adamw update, non-finite skip.

    python benchmarks/bench_train.py          # single chip
    BENCH_BATCH=32 python benchmarks/bench_train.py
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from funasr_tpu.models.paraformer.model import Paraformer
    from funasr_tpu.train_utils.train_step import make_train_step

    batch = int(os.environ.get("BENCH_BATCH", 16))
    secs = 15.0
    t_lfr = -(-(1 + (int(secs * 16000) - 400) // 160) // 6)
    t_pad = -(-t_lfr // 128) * 128
    label_len = 40

    model = Paraformer(
        input_size=560, vocab_size=8404,
        encoder_conf=dict(output_size=512, attention_heads=4,
                          linear_units=2048, num_blocks=50, kernel_size=11,
                          sanm_shfit=0, dropout_rate=0.0),
        decoder_conf=dict(attention_heads=16, linear_units=2048,
                          num_blocks=16, att_layer_num=16, kernel_size=11,
                          sanm_shfit=0),
        predictor_conf=dict(idim=512, l_order=1, r_order=1,
                            tail_threshold=0.45),
        sos=1, eos=2, predictor_bias=1)
    params = model.init_params(jax.random.PRNGKey(0))
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, tx, clip_grad_norm=5.0),
                   donate_argnums=(0, 1))

    rng = np.random.default_rng(0)
    batch_data = {
        "speech": jnp.asarray(
            rng.standard_normal((batch, t_pad, 560)) * 0.3, jnp.float32),
        "speech_lengths": jnp.full((batch,), t_lfr, jnp.int32),
        "text": jnp.asarray(
            rng.integers(3, 8404, (batch, label_len)), jnp.int32),
        "text_lengths": jnp.full((batch,), label_len, jnp.int32),
    }
    key = jax.random.PRNGKey(0)

    params, opt_state, stats = step(params, opt_state, batch_data, key)
    np.asarray(stats["loss"])  # compile fence (device->host copy)

    iters, best = 5, float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, stats = step(params, opt_state, batch_data, key)
        np.asarray(stats["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)

    print(json.dumps({
        "metric": "paraformer_large_train_step_audio_x_realtime_1chip",
        "value": round(batch * secs / best, 1), "unit": "x_realtime",
        "step_ms": round(best * 1000, 1), "batch": batch,
        "loss_finite": bool(np.isfinite(np.asarray(stats["loss"])))}))


if __name__ == "__main__":
    main()
