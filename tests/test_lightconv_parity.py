"""Lightweight/dynamic convolution parity vs the reference torch modules."""

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


def test_paraformer_san_decoder_parity():
    """NAR SAN decoder (embeds in, no causal mask) vs the reference."""
    import jax
    from funasr.models.paraformer.decoder import ParaformerSANDecoder as Ref
    from funasr_tpu.core.module import stack_params
    from funasr_tpu.models.paraformer.san_decoder import ParaformerSANDecoder
    torch.manual_seed(2)
    v, d = 15, 32
    ref = Ref(vocab_size=v, encoder_output_size=d, attention_heads=4,
              linear_units=64, num_blocks=2, dropout_rate=0.0,
              positional_dropout_rate=0.0, input_layer="embed").eval()
    mine = ParaformerSANDecoder(vocab_size=v, encoder_output_size=d,
                                attention_heads=4, linear_units=64,
                                num_blocks=2)
    sd = {k: val.detach().numpy() for k, val in ref.state_dict().items()}

    def lin(prefix):
        p = {"w": jnp.asarray(sd[f"{prefix}.weight"].T)}
        if f"{prefix}.bias" in sd:
            p["b"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    def norm(prefix):
        return {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    def mha(prefix):
        return {f"linear_{x}": lin(f"{prefix}.linear_{x}")
                for x in ("q", "k", "v", "out")}

    layers = [{
        "norm1": norm(f"decoders.{i}.norm1"),
        "norm2": norm(f"decoders.{i}.norm2"),
        "norm3": norm(f"decoders.{i}.norm3"),
        "self_attn": mha(f"decoders.{i}.self_attn"),
        "src_attn": mha(f"decoders.{i}.src_attn"),
        "feed_forward": {"w_1": lin(f"decoders.{i}.feed_forward.w_1"),
                         "w_2": lin(f"decoders.{i}.feed_forward.w_2")},
    } for i in range(2)]
    params = {"decoders": stack_params(layers),
              "after_norm": norm("after_norm"),
              "output_layer": lin("output_layer")}

    rng = np.random.default_rng(2)
    mem = rng.standard_normal((2, 10, d)).astype(np.float32)
    emb = rng.standard_normal((2, 5, d)).astype(np.float32)
    hlens = np.asarray([10, 7])
    ylens = np.asarray([5, 3])
    with torch.no_grad():
        y_ref, _ = ref(torch.from_numpy(mem), torch.from_numpy(hlens),
                       torch.from_numpy(emb), torch.from_numpy(ylens))
    y, _ = mine(params, jnp.asarray(mem), jnp.asarray(hlens),
                jnp.asarray(emb), jnp.asarray(ylens))
    # compare valid positions (reference does not zero padded rows)
    for i, L in enumerate(ylens):
        np.testing.assert_allclose(np.asarray(y)[i, :L], y_ref.numpy()[i, :L],
                                   rtol=2e-4, atol=2e-4)


def test_lcbnet_conv_bias_predictor_parity():
    from funasr.models.lcbnet.encoder import ConvPredictor as Ref
    from funasr_tpu.models.lcbnet.encoder import ConvPredictor
    torch.manual_seed(3)
    d = 32
    ref = Ref(size=d, l_order=3, r_order=3, attention_heads=4,
              attention_dropout_rate=0.0, linear_units=64).eval()
    mine = ConvPredictor(size=d, l_order=3, r_order=3, attention_heads=4,
                         linear_units=64)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def lin(pre):
        p = {"w": jnp.asarray(sd[f"{pre}.weight"].T)}
        if f"{pre}.bias" in sd:
            p["b"] = jnp.asarray(sd[f"{pre}.bias"])
        return p

    params = {
        "atten": {f"linear_{x}": lin(f"atten.linear_{x}")
                  for x in ("q", "k", "v", "out")},
        "norm1": {"scale": jnp.asarray(sd["norm1.weight"]),
                  "bias": jnp.asarray(sd["norm1.bias"])},
        "norm2": {"scale": jnp.asarray(sd["norm2.weight"]),
                  "bias": jnp.asarray(sd["norm2.bias"])},
        "feed_forward": {"w_1": lin("feed_forward.w_1"),
                         "w_2": lin("feed_forward.w_2")},
        "conv1d": {"w": jnp.asarray(sd["conv1d.weight"][:, 0, :].T),
                   "b": jnp.asarray(sd["conv1d.bias"])},
        "output_linear": lin("output_linear"),
    }
    rng = np.random.default_rng(3)
    text = rng.standard_normal((2, 6, d)).astype(np.float32)
    audio = rng.standard_normal((2, 11, d)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(text), torch.from_numpy(audio)).numpy()
    y = np.asarray(mine(params, jnp.asarray(text), jnp.asarray(audio)))
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
