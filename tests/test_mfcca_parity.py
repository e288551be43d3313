"""MFCCA full-shape parity vs the reference torch modules: the multi-frame
cross-channel-attention conformer encoder (conv2d subsampling + legacy rel-pos
attention + channel-fusion conv stack) and an end-to-end hybrid train step."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")]
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")
from conftest import stub_sond_legacy_deps  # noqa: E402

stub_sond_legacy_deps()

# the reference encoder imports EncoderLayer from a legacy package path that
# the snapshot no longer ships; alias it to the real mfcca module
import funasr.models.mfcca.encoder_layer_mfcca as _el  # noqa: E402

sys.modules["funasr.models.encoder.encoder_layer_mfcca"] = _el
sys.modules["funasr.models.encoder"].encoder_layer_mfcca = _el

FEAT, D, HEADS, FFN, BLOCKS, CK = 16, 16, 2, 32, 2, 5
B, C, T = 2, 2, 20


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(3)
    from funasr.models.mfcca.mfcca_encoder import MFCCAEncoder as Ref

    from funasr_tpu.convert.torch_to_jax import convert_state_dict
    from funasr_tpu.models.mfcca.encoder import MFCCAEncoder

    ref = Ref(input_size=FEAT, output_size=D, attention_heads=HEADS,
              linear_units=FFN, num_blocks=BLOCKS, dropout_rate=0.0,
              positional_dropout_rate=0.0, attention_dropout_rate=0.0,
              input_layer="conv2d", cnn_module_kernel=CK).eval()
    mine = MFCCAEncoder(input_size=FEAT, output_size=D, attention_heads=HEADS,
                        linear_units=FFN, num_blocks=BLOCKS,
                        input_layer="conv2d", cnn_module_kernel=CK)
    params = convert_state_dict(dict(ref.state_dict()), mine, "MFCCAEncoder")
    return ref, mine, params


def test_mfcca_encoder_parity(pair, rng):
    ref, mine, params = pair
    x = rng.standard_normal((B * C, T, FEAT)).astype(np.float32)
    lens = np.array([T, T, T - 6, T - 6], np.int32)
    with torch.no_grad():
        want, want_olens, _ = ref(torch.from_numpy(x), torch.from_numpy(lens),
                                  channel_size=C)
    got, got_olens = mine(params, x, lens, channel_size=C)
    np.testing.assert_array_equal(np.asarray(got_olens),
                                  want_olens.numpy().reshape(B, C)[:, 0]
                                  if want_olens.numel() == B * C
                                  else want_olens.numpy())
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=5e-4,
                               atol=5e-4)


def test_mfcca_e2e_train_step(rng):
    import jax
    import jax.numpy as jnp

    from funasr_tpu.models.mfcca.model import MFCCA
    model = MFCCA(input_size=FEAT, vocab_size=11,
                  encoder_conf=dict(output_size=D, attention_heads=HEADS,
                                    linear_units=FFN, num_blocks=BLOCKS,
                                    cnn_module_kernel=CK),
                  decoder_conf=dict(attention_heads=HEADS, linear_units=FFN,
                                    num_blocks=2), ctc_weight=0.3)
    params = model.init_params(jax.random.PRNGKey(0))
    speech = jnp.asarray(rng.standard_normal((B, C, T * 3, FEAT)), jnp.float32)
    slens = jnp.asarray([T * 3, T * 3 - 8])
    text = jnp.asarray(rng.integers(3, 11, (B, 5)))
    tlens = jnp.asarray([5, 4])

    def loss_fn(p):
        loss, _, _ = model.forward_jit(p, speech, slens, text, tlens,
                                       jax.random.PRNGKey(1))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0
    # cross-channel attention params must receive gradient
    cca_g = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))),
        grads["encoder"]["encoders"][0]["cca"], 0.0)
    assert cca_g > 0
