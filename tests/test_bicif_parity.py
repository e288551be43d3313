"""BiCIF timestamp-predictor parity vs reference CifPredictorV3 (cnn_blstm head)."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")]
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")
from conftest import stub_reference_deps  # noqa: E402

stub_reference_deps()


def test_cif_v3_upsample_timestamp_parity(rng):
    torch.manual_seed(4)
    from funasr.models.bicif_paraformer.cif_predictor import CifPredictorV3 as RefV3
    from funasr_tpu.convert.torch_to_jax import SD, convert_cif_predictor
    from funasr_tpu.models.bicif_paraformer.cif_predictor import CifPredictorV3

    kw = dict(idim=32, l_order=1, r_order=1, threshold=1.0, tail_threshold=0.45,
              upsample_times=3, upsample_type="cnn_blstm", use_cif1_cnn=False)
    ref = RefV3(**kw).eval()
    mine = CifPredictorV3(**{k: v for k, v in kw.items()})
    params = convert_cif_predictor(SD(dict(ref.state_dict())))

    hidden = rng.standard_normal((2, 20, 32)).astype(np.float32)
    lens = np.array([20, 14])
    mask_np = np.arange(20)[None] < lens[:, None]
    mask_t = torch.from_numpy(mask_np.astype(np.float32))[:, None, :]
    token_num = np.array([5.0, 3.0], np.float32)

    with torch.no_grad():
        w_ds, w_dsp, w_us, w_usp = ref.get_upsample_timestamp(
            torch.from_numpy(hidden), mask_t, torch.from_numpy(token_num))
    g_ds, g_dsp, g_us, g_usp = mine.get_upsample_timestamp(
        params, np.asarray(hidden), mask_np, np.asarray(token_num))
    np.testing.assert_allclose(np.asarray(g_us), w_us.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_ds), w_ds.numpy(), rtol=2e-4, atol=2e-4)
    # fire positions must agree exactly (they define timestamps)
    thr = 1.0 - 1e-4
    np.testing.assert_array_equal(np.asarray(g_usp) >= thr, w_usp.numpy() >= thr)
