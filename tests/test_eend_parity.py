"""EEND-OLA full-shape parity vs the reference torch modules: encoder, EDA
attractors, and the complete estimate_sequential powerlabel decode."""

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

IDIM, NU, LAYERS, HEADS = 345, 256, 4, 4


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(21)
    from funasr.models.eend.e2e_diar_eend_ola import DiarEENDOLAModel
    from funasr.models.eend.encoder import EENDOLATransformerEncoder as RefEnc
    from funasr.models.eend.encoder_decoder_attractor import \
        EncoderDecoderAttractor as RefEDA
    from funasr_tpu.convert.torch_to_jax import convert_state_dict
    from funasr_tpu.models.eend.model import DiarEENDOLA

    ref_enc = RefEnc(idim=IDIM, n_layers=LAYERS, n_units=NU, e_units=2048,
                     h=HEADS, dropout_rate=0.0)
    ref_eda = RefEDA(n_units=NU, encoder_dropout=0.0, decoder_dropout=0.0)
    ref = DiarEENDOLAModel(frontend=None, encoder=ref_enc,
                           encoder_decoder_attractor=ref_eda, n_units=NU,
                           max_n_speaker=8).eval()
    mine = DiarEENDOLA(input_size=IDIM, n_units=NU, max_n_speaker=8,
                       encoder_conf=dict(n_layers=LAYERS, e_units=2048,
                                         h=HEADS))
    params = convert_state_dict(dict(ref.state_dict()), mine, "DiarEENDOLA")
    return ref, mine, params


def test_eend_encoder_parity(pair, rng):
    ref, mine, params = pair
    x = rng.standard_normal((2, 50, IDIM)).astype(np.float32)
    lens = np.array([50, 50], np.int32)
    with torch.no_grad():
        want = ref.forward_encoder([torch.from_numpy(x[0]),
                                    torch.from_numpy(x[1])],
                                   torch.tensor([50, 50]))
    got, _ = mine.encoder(params["encoder"], np.asarray(x), np.asarray(lens))
    for b in range(2):
        np.testing.assert_allclose(np.asarray(got)[b], want[b].numpy(),
                                   rtol=2e-4, atol=2e-4)


def test_eend_attractor_parity(pair, rng):
    ref, mine, params = pair
    emb = rng.standard_normal((1, 40, NU)).astype(np.float32)
    with torch.no_grad():
        want_att, want_probs = ref.encoder_decoder_attractor.estimate(
            [torch.from_numpy(emb[0])], max_n_speakers=8)
    import jax.numpy as jnp
    got_att, got_logits = mine._attractors(params, jnp.asarray(emb), 8)
    np.testing.assert_allclose(np.asarray(got_att)[0], want_att[0].numpy(),
                               rtol=2e-4, atol=2e-4)
    import jax
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(got_logits))[0],
                               want_probs[0].numpy(), rtol=2e-4, atol=2e-4)


def test_eend_estimate_sequential_parity(pair, rng):
    """Full inference path: same per-frame joint speaker decisions as the
    reference estimate_sequential with shuffle=False and fixed n_speakers."""
    ref, mine, params = pair
    x = rng.standard_normal((1, 60, IDIM)).astype(np.float32)
    with torch.no_grad():
        want_ys, _, _, _ = ref.estimate_sequential(
            [torch.from_numpy(x[0])], n_speakers=2, shuffle=False)
    import jax.numpy as jnp
    got = mine.estimate_sequential(params, jnp.asarray(x),
                                   jnp.asarray([60], np.int32), n_speakers=2)
    np.testing.assert_array_equal(got[0], want_ys[0].numpy())


def test_eend_training_loss_finite(pair, rng):
    import jax
    import jax.numpy as jnp
    _, mine, params = pair
    x = jnp.asarray(rng.standard_normal((2, 30, IDIM)), jnp.float32)
    lens = jnp.asarray([30, 24], np.int32)
    labels = jnp.asarray(rng.integers(0, 2, (2, 30, 3)), jnp.float32)

    def loss_fn(p):
        return mine.forward_jit(p, x, lens, labels, None)[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gn = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                            for g in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gn) and gn > 0
