"""End-to-end Paraformer model tests (tiny config, random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from funasr_tpu.models.paraformer.model import Paraformer


TINY = dict(
    input_size=24,
    vocab_size=40,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                      att_layer_num=2, kernel_size=5, sanm_shfit=0),
    predictor_conf=dict(idim=16, l_order=1, r_order=1, tail_threshold=0.45),
    sos=1, eos=2, predictor_bias=1, sampling_ratio=0.4, lsm_weight=0.1,
    ctc_weight=0.0,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = Paraformer(**TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_forward_loss(model_and_params, rng):
    model, params = model_and_params
    b, t, l = 2, 30, 6
    speech = rng.standard_normal((b, t, 24)).astype(np.float32)
    slens = np.array([30, 21])
    text = rng.integers(3, 40, (b, l)).astype(np.int32)
    tlens = np.array([6, 4])
    text = np.where(np.arange(l)[None] < tlens[:, None], text, -1)
    loss, stats, weight = model.forward_jit(
        params, jnp.asarray(speech), jnp.asarray(slens), jnp.asarray(text),
        jnp.asarray(tlens), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert float(stats["loss_pre"]) >= 0
    # grads flow
    def loss_fn(p):
        return model.forward_jit(p, jnp.asarray(speech), jnp.asarray(slens),
                                 jnp.asarray(text), jnp.asarray(tlens),
                                 jax.random.PRNGKey(1))[0]
    g = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(jnp.square(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_infer_jit_shapes(model_and_params, rng):
    model, params = model_and_params
    speech = rng.standard_normal((2, 40, 24)).astype(np.float32)
    slens = np.array([40, 25])
    yseq, token_lens, score, alphas, peaks = model.infer_jit(
        params, jnp.asarray(speech), jnp.asarray(slens))
    assert yseq.shape[0] == 2
    assert int(token_lens.max()) <= yseq.shape[1]
    assert np.all(np.asarray(token_lens) >= 0)


def test_padding_invariance(model_and_params, rng):
    """Decoding a short utterance must not change when batch padding grows."""
    model, params = model_and_params
    t = 30
    speech = rng.standard_normal((1, t, 24)).astype(np.float32)
    slens = np.array([t])
    y1, l1, *_ = model.infer_jit(params, jnp.asarray(speech), jnp.asarray(slens))
    padded = np.concatenate([speech, np.zeros((1, 20, 24), np.float32)], axis=1)
    y2, l2, *_ = model.infer_jit(params, jnp.asarray(padded), jnp.asarray(slens))
    assert int(l1[0]) == int(l2[0])
    n = int(l1[0])
    np.testing.assert_array_equal(np.asarray(y1)[0, :n], np.asarray(y2)[0, :n])
