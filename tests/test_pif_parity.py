"""E-Paraformer PIF predictor parity vs the reference torch module."""

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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_pif_predictor_parity():
    from funasr.models.e_paraformer.pif_predictor import PifPredictor as RefPif
    from funasr_tpu.convert.torch_to_jax import SD, convert_pif_predictor
    from funasr_tpu.models.e_paraformer.pif_predictor import PifPredictor

    torch.manual_seed(0)
    ref = RefPif(idim=32, l_order=1, r_order=1, dropout=0.0, sigma_heads=4).eval()
    mine = PifPredictor(idim=32, l_order=1, r_order=1, sigma_heads=4)
    params = convert_pif_predictor(SD({k: v for k, v in ref.state_dict().items()}))

    rng = np.random.default_rng(0)
    b, t, d = 2, 25, 32
    hidden = rng.standard_normal((b, t, d)).astype(np.float32)
    mask_np = np.zeros((b, t), bool)
    mask_np[0, :25] = True
    mask_np[1, :18] = True
    tgt_len = np.asarray([6, 4])

    # reference quirk: target_label_length alone leaves target_mask unbound
    # (pif_predictor.py:127) — pass padded target_label as training does
    labels = np.full((b, int(tgt_len.max())), -1, np.int64)
    labels[0, :6] = 1
    labels[1, :4] = 1
    with torch.no_grad():
        emb_ref, tok_ref, alphas_ref, _ = ref(
            torch.from_numpy(hidden),
            target_label=torch.from_numpy(labels), ignore_id=-1,
            mask=torch.from_numpy(mask_np)[:, None, :])
    emb, tok, alphas, _ = mine(
        {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
         if isinstance(v, dict) else jnp.asarray(v) for k, v in params.items()},
        jnp.asarray(hidden), jnp.asarray(mask_np), int(tgt_len.max()),
        target_length=jnp.asarray(tgt_len))

    np.testing.assert_allclose(np.asarray(tok), tok_ref.numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(alphas), alphas_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    # embeddings: reference keeps U_max = max target length
    np.testing.assert_allclose(np.asarray(emb), emb_ref.numpy(),
                               rtol=2e-4, atol=2e-4)
