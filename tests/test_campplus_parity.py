"""CAM++ speaker-embedding parity vs the reference torch implementation."""

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


def test_campplus_embedding_parity(rng):
    torch.manual_seed(5)
    from funasr.models.campplus.model import CAMPPlus as RefModel
    from funasr_tpu.convert.torch_to_jax import convert_campplus
    from funasr_tpu.models.campplus.model import CAMPPlus

    ref = RefModel(feat_dim=80, embedding_size=192, memory_efficient=False).eval()
    mine = CAMPPlus(feat_dim=80, embedding_size=192)
    params = convert_campplus(dict(ref.state_dict()), mine)

    x = rng.standard_normal((2, 150, 80)).astype(np.float32)  # 1.5s chunks
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(mine.forward(params, np.asarray(x)))
    assert got.shape == want.shape == (2, 192)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
