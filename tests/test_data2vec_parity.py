"""data2vec full-shape parity vs the reference torch modules: conv feature
extractor, pos-conv transformer encoder (features_only path), and the complete
EMA-teacher masked-regression pretraining loss."""

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

FEAT, D, LAYERS, HEADS, FFN, TOPK = 8, 16, 3, 2, 32, 2
CONV = "[(16,2,2)] + [(16,2,2)]"


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(11)
    from funasr.models.data2vec.data2vec_encoder import Data2VecEncoder as Ref

    from funasr_tpu.convert.torch_to_jax import convert_state_dict
    from funasr_tpu.models.data2vec.model import Data2VecPretrainModel

    ref = Ref(input_size=FEAT, extractor_mode="default",
              conv_feature_layers=CONV, encoder_layers=LAYERS,
              encoder_embed_dim=D, encoder_ffn_embed_dim=FFN,
              encoder_attention_heads=HEADS, dropout=0.0,
              attention_dropout=0.0, activation_dropout=0.0,
              dropout_input=0.0, dropout_features=0.0, conv_pos=4,
              conv_pos_groups=2, average_top_k_layers=TOPK,
              instance_norm_target_layer=True, mask_prob=0.65,
              mask_length=2, ema_decay=0.999).eval()

    mine = Data2VecPretrainModel(encoder_conf=dict(
        input_size=FEAT, extractor_mode="default", conv_feature_layers=CONV,
        encoder_layers=LAYERS, encoder_embed_dim=D, encoder_ffn_embed_dim=FFN,
        encoder_attention_heads=HEADS, conv_pos=4, conv_pos_groups=2,
        average_top_k_layers=TOPK, instance_norm_target_layer=True,
        mask_prob=0.65, mask_length=2, ema_decay=0.999))
    params = convert_state_dict(dict(ref.state_dict()), mine,
                                "Data2VecPretrainModel")
    return ref, mine, params


def _inputs(rng, b=2, t=30):
    x = rng.standard_normal((b, t, FEAT)).astype(np.float32)
    lens = np.array([t, t - 8], np.int32)
    return x, lens


def test_data2vec_features_parity(pair, rng):
    ref, mine, params = pair
    x, lens = _inputs(rng)
    with torch.no_grad():
        want, want_lens, _ = ref.forward(torch.from_numpy(x),
                                         torch.from_numpy(lens), mask=False,
                                         features_only=True)
    got, got_lens = mine.extract_features(params, x, lens)
    np.testing.assert_array_equal(np.asarray(got_lens), want_lens.numpy())
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4,
                               atol=2e-4)


def test_data2vec_pretrain_loss_parity(pair, rng):
    ref, mine, params = pair
    x, lens = _inputs(rng)
    t_out = int(mine.encoder.feat_extract_output_length(30))
    out_lens = np.asarray([int(mine.encoder.feat_extract_output_length(l))
                           for l in lens])
    mask = np.zeros((2, t_out), bool)
    for b in range(2):
        idx = rng.choice(out_lens[b], size=max(2, out_lens[b] // 3),
                         replace=False)
        mask[b, idx] = True

    ref.make_ema_teacher()
    with torch.no_grad():
        res = ref.forward(torch.from_numpy(x), torch.from_numpy(lens),
                          mask=True, features_only=False,
                          mask_indices=torch.from_numpy(mask))
    want_loss = float(res["losses"]["regression"]) / float(res["sample_size"])

    loss, stats, _ = mine.forward_jit(params, x, lens, mask_indices=mask)
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-3)
    np.testing.assert_allclose(float(stats["target_var"]),
                               float(res["target_var"]), rtol=1e-3)
    np.testing.assert_allclose(float(stats["pred_var"]),
                               float(res["pred_var"]), rtol=1e-3)


def test_data2vec_ema_and_grads(pair, rng):
    import jax
    import jax.numpy as jnp
    _, mine, params = pair
    x, lens = _inputs(rng)

    def loss_fn(p):
        loss, _, _ = mine.forward_jit(p, jnp.asarray(x), jnp.asarray(lens),
                                      rng=jax.random.PRNGKey(0))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # teacher path is stop-gradiented: its grads must be exactly zero
    ema_gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads["ema"], 0.0)
    assert ema_gnorm == 0.0
    stu_gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads["student"], 0.0)
    assert stu_gnorm > 0.0

    # annealed EMA step moves the teacher toward the student
    p2 = jax.tree_util.tree_map(lambda z: z, params)
    p2["student"]["encoder"]["layers"][0]["fc1"]["w"] = \
        p2["student"]["encoder"]["layers"][0]["fc1"]["w"] + 1.0
    p3 = mine.ema_update(p2, num_updates=0)
    moved = np.asarray(p3["ema"]["layers"][0]["fc1"]["w"]
                       - params["ema"]["layers"][0]["fc1"]["w"])
    assert np.all(moved > 0) and np.all(moved < 1.0)
