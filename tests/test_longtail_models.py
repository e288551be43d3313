"""Long-tail model tests: ContextualParaformer, FsmnKWS, ERes2NetV2 (parity)."""

import os
import sys

import jax
import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)
from conftest import stub_reference_deps  # noqa: E402

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

stub_reference_deps()

TOKENS = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(20)] + ["<unk>"]


def test_contextual_paraformer_inference():
    from funasr_tpu.frontends.wav_frontend import WavFrontend
    from funasr_tpu.models.contextual_paraformer.model import ContextualParaformer
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer

    model = ContextualParaformer(
        input_size=560, vocab_size=len(TOKENS),
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, kernel_size=5),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                          att_layer_num=2, kernel_size=5, sanm_shfit=0),
        predictor_conf=dict(idim=16), inner_dim=16,
        sos=1, eos=2, predictor_bias=1)
    params = model.init_params(jax.random.PRNGKey(0))
    tok = CharTokenizer(token_list=list(TOKENS))
    frontend = WavFrontend(fs=16000, lfr_m=7, lfr_n=6, n_mels=80, dither=0.0)
    wav = (np.random.default_rng(0).standard_normal(16000) * 0.1).astype(np.float32)
    res_plain, _ = model.inference(params, wav, tokenizer=tok, frontend=frontend)
    res_hw, _ = model.inference(params, wav, tokenizer=tok, frontend=frontend,
                                hotword="一丁 丂")
    assert "text" in res_plain[0] and "text" in res_hw[0]


def test_fsmn_kws_detect():
    from funasr_tpu.frontends.wav_frontend import WavFrontend
    from funasr_tpu.models.fsmn_kws.model import FsmnKWS
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer

    model = FsmnKWS(
        encoder="FSMN",
        encoder_conf=dict(input_dim=400, input_affine_dim=64, fsmn_layers=2,
                          linear_dim=64, proj_dim=32, lorder=10, rorder=0,
                          lstride=1, rstride=1, output_affine_dim=64,
                          output_dim=len(TOKENS), use_softmax=False),
        input_size=400, vocab_size=len(TOKENS))
    params = model.init_params(jax.random.PRNGKey(0))
    tok = CharTokenizer(token_list=list(TOKENS))
    frontend = WavFrontend(fs=16000, lfr_m=5, lfr_n=1, n_mels=80, dither=0.0)
    wav = (np.random.default_rng(0).standard_normal(16000) * 0.1).astype(np.float32)
    res, _ = model.inference(params, wav, tokenizer=tok, frontend=frontend,
                             keywords="一丁 丂七丄", kws_threshold=-100.0)
    # with a permissive threshold both keywords should report
    assert len(res[0]["value"]) == 2
    res2, _ = model.inference(params, wav, tokenizer=tok, frontend=frontend,
                              keywords="一丁", kws_threshold=100.0)
    assert res2[0]["value"] == []

    # training loss
    import jax.numpy as jnp
    feats, flens = frontend.extract([wav])
    text = jnp.asarray([[3, 4, 5]], jnp.int32)
    loss, _, _ = model.forward_jit(params, jnp.asarray(feats), jnp.asarray(flens),
                                   text, jnp.asarray([3]), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_eres2netv2_parity(rng):
    torch.manual_seed(6)
    from funasr.models.eres2net.eres2netv2 import ERes2NetV2 as RefModel
    from funasr_tpu.convert.torch_to_jax import convert_eres2netv2
    from funasr_tpu.models.eres2net.model import ERes2NetV2

    ref = RefModel(num_blocks=[1, 1, 1, 1], m_channels=16, feat_dim=32,
                   embedding_size=32, baseWidth=26, scale=2, expansion=2).eval()
    mine = ERes2NetV2(num_blocks=[1, 1, 1, 1], m_channels=16, feat_dim=32,
                      embedding_size=32, baseWidth=26, scale=2, expansion=2)
    params = convert_eres2netv2(dict(ref.state_dict()), mine)
    x = rng.standard_normal((2, 64, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(mine.forward(params, np.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)
