"""Lightweight/dynamic convolution parity vs the reference torch modules."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)
torch = pytest.importorskip("torch")

from conftest import stub_reference_deps  # noqa: E402

stub_reference_deps()

import jax.numpy as jnp  # noqa: E402


def test_lightweight_conv_parity():
    from funasr.models.transformer.utils.lightconv import LightweightConvolution
    from funasr_tpu.models.transformer.conv_decoders import (
        lightweight_conv_apply)
    torch.manual_seed(0)
    d, h, k = 32, 4, 5
    ref = LightweightConvolution(h, d, dropout_rate=0.0, kernel_size=k,
                                 use_kernel_mask=True).eval()
    params = {
        "linear1": {"w": ref.linear1.weight.detach().numpy().T,
                    "b": ref.linear1.bias.detach().numpy()},
        "linear2": {"w": ref.linear2.weight.detach().numpy().T,
                    "b": ref.linear2.bias.detach().numpy()},
        "weight": ref.weight.detach().numpy()[:, 0, :],
    }
    params = {kk: ({k2: jnp.asarray(v2) for k2, v2 in vv.items()}
                   if isinstance(vv, dict) else jnp.asarray(vv))
              for kk, vv in params.items()}
    x = np.random.default_rng(0).standard_normal((2, 12, d)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x), None, None, None).numpy()
    y = np.asarray(lightweight_conv_apply(params, jnp.asarray(x), h, k,
                                          causal=True))
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-5)


def test_dynamic_conv_parity():
    from funasr.models.transformer.utils.dynamic_conv import DynamicConvolution
    from funasr_tpu.models.transformer.conv_decoders import dynamic_conv_apply
    torch.manual_seed(1)
    d, h, k = 32, 4, 5
    ref = DynamicConvolution(h, d, dropout_rate=0.0, kernel_size=k,
                             use_kernel_mask=True).eval()
    params = {
        "linear1": {"w": ref.linear1.weight.detach().numpy().T,
                    "b": ref.linear1.bias.detach().numpy()},
        "linear2": {"w": ref.linear2.weight.detach().numpy().T,
                    "b": ref.linear2.bias.detach().numpy()},
        "linear_weight": {"w": ref.linear_weight.weight.detach().numpy().T,
                          "b": ref.linear_weight.bias.detach().numpy()},
    }
    params = {kk: {k2: jnp.asarray(v2) for k2, v2 in vv.items()}
              for kk, vv in params.items()}
    x = np.random.default_rng(1).standard_normal((2, 12, d)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x), None, None, None).numpy()
    y = np.asarray(dynamic_conv_apply(params, jnp.asarray(x), h, k,
                                      causal=True))
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-5)
