"""End-to-end learning proof: train -> decode -> CER == 0.

Without hub checkpoints in this environment, the strongest accuracy evidence
is closing the whole loop: a tiny Paraformer overfits four synthetic
tone-sequence utterances (distinct tones <-> distinct token strings) through
the real train step (CTC+CE+MAE, glancing sampler), then the real greedy
decode transcribes all four exactly and the CER metric reports 0. Exercises
encoder/CIF/decoder/training/decoding/metric together — a regression here
means the system stopped being able to learn.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier


def test_overfit_tiny_paraformer_to_zero_cer():
    import optax

    from funasr_tpu import tables
    from funasr_tpu.frontends.wav_frontend import WavFrontend
    from funasr_tpu.metrics.wer import compute_cer
    from funasr_tpu.train_utils.train_step import make_train_step

    model = tables.model_classes["Paraformer"](
        input_size=560, vocab_size=12,
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=64,
                          num_blocks=2, kernel_size=11, dropout_rate=0.0),
        decoder_conf=dict(attention_heads=4, linear_units=64, num_blocks=2,
                          att_layer_num=2, kernel_size=11, sanm_shfit=0),
        predictor_conf=dict(idim=32), sos=1, eos=2, predictor_bias=1,
        sampling_ratio=0.4)
    params = model.init_params(jax.random.PRNGKey(0))
    frontend = WavFrontend(fs=16000, lfr_m=7, lfr_n=6, n_mels=80, dither=0.0)

    fs = 16000

    def tone(freq, n):
        return 0.3 * np.sin(2 * np.pi * freq * np.arange(n) / fs)

    texts = [[3, 4, 5], [5, 4, 3], [6, 7, 8], [8, 7, 6]]
    freqs = {3: 300, 4: 500, 5: 800, 6: 1200, 7: 1800, 8: 2500}
    utts = [np.concatenate([tone(freqs[t], 4800) for t in seq]
                           ).astype(np.float32) for seq in texts]
    feats, flens = frontend.extract(utts)
    feats, flens = jnp.asarray(feats), jnp.asarray(flens)
    batch = {"speech": feats, "speech_lengths": flens,
             "text": jnp.asarray(texts, jnp.int32),
             "text_lengths": jnp.full((4,), 3, jnp.int32)}

    tx = optax.adam(2e-3)
    opt = tx.init(params)
    step = jax.jit(make_train_step(model, tx, clip_grad_norm=5.0))
    first_loss = None
    for i in range(400):
        params, opt, stats = step(params, opt, batch, jax.random.PRNGKey(i))
        if first_loss is None:
            first_loss = float(stats["loss"])
    assert float(stats["loss"]) < first_loss * 0.2, (first_loss,
                                                     float(stats["loss"]))

    infer = jax.jit(lambda p, s, l: model.infer_jit(p, s, l, max_tokens=8))
    yseq, toklens, _, _, _ = infer(params, feats, flens)
    yseq, toklens = np.asarray(yseq), np.asarray(toklens)
    hyps = [[int(x) for x in yseq[i, : toklens[i]] if x > 2] for i in range(4)]
    assert hyps == texts, (hyps, texts)

    refs_s = ["".join(chr(ord("a") + t) for t in seq) for seq in texts]
    hyps_s = ["".join(chr(ord("a") + t) for t in seq) for seq in hyps]
    cer = compute_cer(refs_s, hyps_s)
    assert cer["cer"] == 0.0, cer
