"""Numerical parity vs the reference PyTorch modules (CPU torch).

Methodology from the reference's port-fidelity playbook (runtime/llama.cpp/DESIGN.md):
random-init the torch module, convert its state dict with ``funasr_tpu.convert``, and
compare per-stage outputs on random inputs. Skipped when /root/reference is absent.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")]

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def torch_seed():
    torch.manual_seed(0)


def _to_t(x):
    return torch.from_numpy(np.asarray(x))


def test_sanm_attention_parity(rng, torch_seed):
    from funasr.models.sanm.attention import MultiHeadedAttentionSANM
    from funasr_tpu.convert.torch_to_jax import SD
    from funasr_tpu.models.sanm.attention import (
        SANMAttentionConfig, sanm_attention_apply)

    n_head, in_feat, n_feat, k = 4, 48, 32, 11
    ref = MultiHeadedAttentionSANM(n_head, in_feat, n_feat, 0.0, k, sanm_shfit=0).eval()
    sd = SD({k_: v for k_, v in ref.state_dict().items()})
    params = {
        "linear_q_k_v": sd.linear("linear_q_k_v"),
        "linear_out": sd.linear("linear_out"),
        "fsmn_block": sd.dwconv("fsmn_block"),
    }
    x = rng.standard_normal((2, 20, in_feat)).astype(np.float32)
    lens = np.array([20, 13])
    mask_t = (torch.arange(20)[None, :] < _to_t(lens)[:, None]).float()[:, None, :]
    with torch.no_grad():
        want = ref(_to_t(x), mask_t).numpy()
    cfg = SANMAttentionConfig(n_head, in_feat, n_feat, k, 0)
    got = np.asarray(sanm_attention_apply(params, cfg,
                                          np.asarray(x), np.arange(20)[None] < lens[:, None]))
    valid = np.arange(20)[None, :, None] < lens[:, None, None]
    np.testing.assert_allclose(got * valid, want * valid, rtol=1e-4, atol=1e-4)


def _small_encoder_pair(rng):
    from funasr.models.sanm.encoder import SANMEncoder as RefEnc
    from funasr_tpu.convert.torch_to_jax import SD, convert_sanm_encoder
    from funasr_tpu.models.sanm.encoder import SANMEncoder

    kw = dict(input_size=48, output_size=32, attention_heads=4, linear_units=64,
              num_blocks=3, input_layer="pe", kernel_size=11, sanm_shfit=0,
              dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0)
    ref = RefEnc(**kw).eval()
    mine = SANMEncoder(**kw)
    params = convert_sanm_encoder(SD(dict(ref.state_dict())), 3)
    return ref, mine, params


def test_sanm_encoder_parity(rng, torch_seed):
    ref, mine, params = _small_encoder_pair(rng)
    x = rng.standard_normal((2, 25, 48)).astype(np.float32)
    lens = np.array([25, 17])
    with torch.no_grad():
        want, want_lens, _ = ref(_to_t(x), _to_t(lens))
    got, got_lens = mine(params, np.asarray(x), lens)
    got = np.asarray(got)
    valid = np.arange(25)[None, :, None] < lens[:, None, None]
    np.testing.assert_allclose(got * valid, want.numpy() * valid, rtol=2e-4, atol=2e-4)


def test_cif_predictor_parity(rng, torch_seed):
    from funasr.models.paraformer.cif_predictor import CifPredictorV2 as RefCif
    from funasr_tpu.convert.torch_to_jax import SD, convert_cif_predictor
    from funasr_tpu.models.paraformer.cif_predictor import CifPredictorV2

    ref = RefCif(idim=32, l_order=1, r_order=1, threshold=1.0,
                 tail_threshold=0.45).eval()
    mine = CifPredictorV2(idim=32, l_order=1, r_order=1, threshold=1.0,
                          tail_threshold=0.45)
    params = convert_cif_predictor(SD(dict(ref.state_dict())))

    hidden = rng.standard_normal((2, 30, 32)).astype(np.float32)
    lens = np.array([30, 22])
    mask_np = (np.arange(30)[None] < lens[:, None])
    mask_t = _to_t(mask_np.astype(np.float32))[:, None, :]
    with torch.no_grad():
        want_embeds, want_tok, want_alphas, want_peak = ref(
            _to_t(hidden), None, mask_t)
    got_embeds, got_tok, got_alphas, got_peak = mine(
        params, np.asarray(hidden), mask_np, max_tokens=31)
    np.testing.assert_allclose(np.asarray(got_tok), want_tok.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_alphas), want_alphas.numpy(),
                               rtol=1e-4, atol=1e-4)
    k = want_embeds.shape[1]
    np.testing.assert_allclose(np.asarray(got_embeds)[:, :k], want_embeds.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_paraformer_decoder_parity(rng, torch_seed):
    from funasr.models.paraformer.decoder import ParaformerSANMDecoder as RefDec
    from funasr_tpu.convert.torch_to_jax import SD, convert_paraformer_decoder
    from funasr_tpu.models.paraformer.decoder import ParaformerSANMDecoder

    kw = dict(vocab_size=50, encoder_output_size=32, attention_heads=4,
              linear_units=64, num_blocks=3, att_layer_num=3, kernel_size=11,
              sanm_shfit=0, dropout_rate=0.0, positional_dropout_rate=0.0,
              self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0)
    ref = RefDec(**kw).eval()
    mine = ParaformerSANMDecoder(**kw)
    params = convert_paraformer_decoder(SD(dict(ref.state_dict())), 3, 3)

    memory = rng.standard_normal((2, 25, 32)).astype(np.float32)
    embeds = rng.standard_normal((2, 9, 32)).astype(np.float32)
    hlens = np.array([25, 17])
    ylens = np.array([9, 6])
    with torch.no_grad():
        want, _ = ref(_to_t(memory), _to_t(hlens), _to_t(embeds), _to_t(ylens))
    got, _ = mine(params, np.asarray(memory), hlens, np.asarray(embeds), ylens)
    got = np.asarray(got)
    valid = np.arange(9)[None, :, None] < ylens[:, None, None]
    np.testing.assert_allclose(got * valid, want.numpy() * valid, rtol=2e-4, atol=2e-4)
