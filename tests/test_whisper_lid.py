"""Whisper-encoder + ERes2Net LID model."""

import jax
import jax.numpy as jnp
import numpy as np


def _model():
    import funasr_tpu  # noqa: F401
    from funasr_tpu.register import tables
    return tables.model_classes["OpenAIWhisperLIDModel"](
        vocab_size=6,
        encoder_conf=dict(whisper_size="whisper-tiny", encoder_layers=2,
                          decoder_layers=1, d_model=64,
                          encoder_attention_heads=4, decoder_attention_heads=4,
                          encoder_ffn_dim=128, decoder_ffn_dim=128,
                          num_mel_bins=80),
        lid_predictor_conf=dict(num_blocks=(1, 1, 1, 1), m_channels=8,
                                embedding_size=32),
        proj_dim=80, clip_frames=20)


def test_whisper_lid_train_step(rng):
    m = _model()
    p = m.init_params(jax.random.PRNGKey(0))
    mel = jnp.asarray(rng.standard_normal((2, 64, 80)), jnp.float32)
    lens = jnp.asarray([64, 50])
    lid = jnp.asarray([[3], [1]])
    loss, stats, _ = m.forward_jit(p, mel, lens, lid, jnp.asarray([1, 1]))
    assert np.isfinite(float(loss)) and 0.0 <= float(stats["acc_lid"]) <= 1.0
    # the head is trainable: a gradient step on the output layer reduces loss
    g = jax.grad(lambda pp: m.forward_jit(pp, mel, lens, lid,
                                          jnp.asarray([1, 1]))[0])(p)
    p2 = jax.tree_util.tree_map(lambda a, b: a - 0.5 * b, p, g)
    loss2, _, _ = m.forward_jit(p2, mel, lens, lid, jnp.asarray([1, 1]))
    assert float(loss2) < float(loss)


def test_whisper_lid_logits_shape(rng):
    m = _model()
    p = m.init_params(jax.random.PRNGKey(1))
    mel = jnp.asarray(rng.standard_normal((3, 48, 80)), jnp.float32)
    logits = m.logits(p, mel, jnp.asarray([48, 30, 10]))
    assert logits.shape == (3, 6)
