"""Streaming Paraformer parity vs reference torch chunked components.

Feeds identical synthetic LFR feature chunks through both chunked encoders and both
chunked CIF/decoder stacks (bypassing the torchaudio-dependent frontend) and compares
per-chunk outputs."""

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

ENC_CONF = dict(input_size=24, output_size=32, attention_heads=4, linear_units=64,
                num_blocks=3, kernel_size=11, sanm_shfit=0, dropout_rate=0.0,
                positional_dropout_rate=0.0, attention_dropout_rate=0.0)
CHUNK = [0, 10, 5]
LOOK_BACK = 2


def _ref_enc_cache():
    return {"start_idx": 0, "chunk_size": CHUNK, "encoder_chunk_look_back": LOOK_BACK,
            "last_chunk": False, "opt": None, "tail_chunk": False,
            "feats": torch.zeros((1, CHUNK[0] + CHUNK[2], ENC_CONF["input_size"]))}


def test_chunked_encoder_parity(rng):
    torch.manual_seed(7)
    from funasr.models.scama.encoder import SANMEncoderChunkOpt as RefEnc
    from funasr_tpu.convert.torch_to_jax import SD, convert_sanm_encoder
    from funasr_tpu.models.scama.encoder import SANMEncoderChunkOpt

    ref = RefEnc(**ENC_CONF, input_layer="pe_online").eval()
    mine = SANMEncoderChunkOpt(**ENC_CONF)
    params = convert_sanm_encoder(SD(dict(ref.state_dict())), ENC_CONF["num_blocks"])

    ref_cache = _ref_enc_cache()
    import jax.numpy as jnp
    my_cache = {"start_idx": 0, "chunk_size": CHUNK,
                "encoder_chunk_look_back": LOOK_BACK, "opt": None,
                "tail_chunk": False,
                "feats": jnp.zeros((1, CHUNK[0] + CHUNK[2], ENC_CONF["input_size"]))}

    for step in range(3):
        chunk = rng.standard_normal((1, 10, 24)).astype(np.float32)
        with torch.no_grad():
            want, _, _ = ref.forward_chunk(torch.from_numpy(chunk.copy()),
                                           torch.tensor([10]), cache=ref_cache)
        got, _ = mine.forward_chunk(params, np.asarray(chunk), np.asarray([10]),
                                    my_cache)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4,
                                   atol=2e-4, err_msg=f"chunk {step}")


def test_chunked_cif_parity(rng):
    torch.manual_seed(8)
    from funasr.models.paraformer.cif_predictor import CifPredictorV2 as RefCif
    from funasr_tpu.convert.torch_to_jax import SD, convert_cif_predictor
    from funasr_tpu.models.paraformer.cif_predictor import CifPredictorV2

    ref = RefCif(idim=32, l_order=1, r_order=1, threshold=1.0,
                 tail_threshold=0.45).eval()
    mine = CifPredictorV2(idim=32, l_order=1, r_order=1, threshold=1.0,
                          tail_threshold=0.45)
    params = convert_cif_predictor(SD(dict(ref.state_dict())))

    ref_cache = {"chunk_size": CHUNK,
                 "cif_hidden": torch.zeros((1, 1, 32)),
                 "cif_alphas": torch.zeros((1, 1))}
    my_state = mine.init_state(1, 32)

    for step in range(3):
        is_final = step == 2
        hidden = rng.standard_normal((1, 15, 32)).astype(np.float32) * 2.0
        with torch.no_grad():
            want_embeds, want_n, _, _ = ref.forward_chunk(
                torch.from_numpy(hidden.copy()), cache=ref_cache, is_final=is_final)
        got_embeds, got_n, my_state = mine.forward_chunk(
            params, np.asarray(hidden), my_state, max_tokens=20,
            is_final=is_final, chunk_size=CHUNK)
        n_want = int(want_n[0])
        assert int(got_n[0]) == n_want, f"chunk {step}: fired {got_n} vs {n_want}"
        if n_want > 0:
            np.testing.assert_allclose(
                np.asarray(got_embeds)[0, :n_want],
                want_embeds[0, :n_want].numpy(), rtol=1e-3, atol=1e-3,
                err_msg=f"chunk {step}")


def test_chunked_decoder_parity(rng):
    torch.manual_seed(9)
    from funasr.models.paraformer.decoder import ParaformerSANMDecoder as RefDec
    from funasr_tpu.convert.torch_to_jax import SD, convert_paraformer_decoder
    from funasr_tpu.models.paraformer.decoder import ParaformerSANMDecoder

    kw = dict(vocab_size=40, encoder_output_size=32, attention_heads=4,
              linear_units=64, num_blocks=2, att_layer_num=2, kernel_size=11,
              sanm_shfit=5, dropout_rate=0.0, positional_dropout_rate=0.0,
              self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0)
    ref = RefDec(**kw).eval()
    mine = ParaformerSANMDecoder(**kw)
    params = convert_paraformer_decoder(SD(dict(ref.state_dict())), 2, 2)

    ref_cache = {"decode_fsmn": None, "opt": None, "chunk_size": CHUNK,
                 "decoder_chunk_look_back": 1}
    my_cache = {"decode_fsmn": None, "opt": None, "chunk_size": CHUNK,
                "decoder_chunk_look_back": 1}
    for step in range(3):
        memory = rng.standard_normal((1, 15, 32)).astype(np.float32)
        tgt = rng.standard_normal((1, 3, 32)).astype(np.float32)
        with torch.no_grad():
            want = ref.forward_chunk(torch.from_numpy(memory.copy()),
                                     torch.from_numpy(tgt.copy()), cache=ref_cache)
        got = mine.forward_chunk(params, np.asarray(memory), np.asarray(tgt),
                                 my_cache)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4,
                                   atol=2e-4, err_msg=f"chunk {step}")
