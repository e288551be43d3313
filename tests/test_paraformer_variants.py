"""EParaformer (PIF predictor), ParaformerV2 (CTC-compression), and the jittable
forced aligner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier


@pytest.fixture
def toy_batch(rng):
    speech = jnp.asarray(rng.standard_normal((2, 40, 20)), jnp.float32)
    speech_lens = jnp.asarray([40, 31])
    text = jnp.full((2, 6), -1, jnp.int32)
    text = text.at[0, :5].set(jnp.asarray(rng.integers(3, 15, 5)))
    text = text.at[1, :3].set(jnp.asarray(rng.integers(3, 15, 3)))
    text_lens = jnp.asarray([5, 3])
    return speech, speech_lens, text, text_lens


def _conf(extra=None):
    conf = dict(
        input_size=20, vocab_size=16, sos=1, eos=2,
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=64,
                          num_blocks=2, kernel_size=11, sanm_shfit=0,
                          dropout_rate=0.0),
        decoder_conf=dict(attention_heads=4, linear_units=64, num_blocks=2,
                          att_layer_num=2, kernel_size=11, sanm_shfit=0,
                          dropout_rate=0.0),
        predictor_conf=dict(idim=32, l_order=1, r_order=1, threshold=1.0),
    )
    conf.update(extra or {})
    return conf


def test_e_paraformer_train_and_infer(toy_batch):
    import funasr_tpu  # noqa: F401
    from funasr_tpu.register import tables
    model = tables.model_classes["EParaformer"](**_conf(
        dict(sampling_ratio=0.0, ctc_weight=0.0)))
    params = model.init_params(jax.random.PRNGKey(0))
    speech, sl, text, tl = toy_batch
    loss, stats, _ = model.forward_jit(params, speech, sl, text, tl,
                                       jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # gradients flow through the PIF einsum
    g = jax.grad(lambda p: model.forward_jit(p, speech, sl, text, tl,
                                             jax.random.PRNGKey(1))[0])(params)
    gn = float(jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree_util.tree_leaves(g))))
    assert np.isfinite(gn) and gn > 0
    yseq, toklens, score, _, _ = model.infer_jit(params, speech, sl, max_tokens=12)
    assert yseq.shape == (2, 12) and np.all(np.asarray(toklens) <= 12)


def test_pif_predictor_target_length_scaling(rng):
    from funasr_tpu.models.e_paraformer.pif_predictor import PifPredictor
    pred = PifPredictor(idim=16, sigma_heads=4)
    p = pred.init(jax.random.PRNGKey(0))
    h = jnp.asarray(rng.standard_normal((1, 30, 16)), jnp.float32)
    mask = jnp.ones((1, 30), bool)
    emb, tok, alphas, _ = pred(p, h, mask, 7, target_length=jnp.asarray([7]))
    assert emb.shape == (1, 7, 16)
    # rescaled alphas must sum to the target length
    np.testing.assert_allclose(float(jnp.sum(alphas)), 7.0, rtol=1e-5)


def test_paraformer_v2_train_and_infer(toy_batch):
    import funasr_tpu  # noqa: F401
    from funasr_tpu.register import tables
    model = tables.model_classes["Paraformer_v2_community"](**_conf(
        dict(ctc_weight=0.5, ctc_conf=dict())))
    params = model.init_params(jax.random.PRNGKey(0))
    speech, sl, text, tl = toy_batch
    loss, stats, _ = model.forward_jit(params, speech, sl, text, tl,
                                       jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and np.isfinite(float(stats["loss_ctc"]))
    yseq, toklens, _, _, _ = model.infer_jit(params, speech, sl, max_tokens=16)
    assert yseq.shape[1] == 16


def test_compress_ctc_probs_matches_manual(rng):
    from funasr_tpu.models.paraformer_v2.model import (compress_ctc_probs,
                                                       map_path_to_target_index)
    path = jnp.asarray([[0, 3, 3, 0, 5, 0, 3, 3, 0]])
    idx = np.asarray(map_path_to_target_index(path, 0))[0]
    np.testing.assert_array_equal(idx, [-1, 0, 0, -1, 1, -1, 2, 2, -1])
    probs = jnp.asarray(rng.random((1, 9, 4)), jnp.float32)
    comp, counts = compress_ctc_probs(probs, jnp.asarray(idx)[None],
                                      jnp.ones((1, 9), bool), 4)
    np.testing.assert_allclose(np.asarray(comp)[0, 0],
                               np.asarray(probs)[0, 1:3].mean(0), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(counts)[0], [2, 1, 2, 0])
