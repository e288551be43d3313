"""SOND full-model parity vs the reference torch modules: ResNet34SpL2RegDiar
speech encoder, ConvEncoder speaker encoder, DotScorer CI, SelfAttentionEncoder
CD, FsmnEncoder post-net, and the complete prediction_forward + training loss."""

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

FEAT, SPK_DIM, MAX_SPK, D = 16, 12, 4, 16
VOCAB = 2 ** MAX_SPK
TOKEN_LIST = [str(i) for i in range(VOCAB)]


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(7)
    from funasr.models.sond.e2e_diar_sond import DiarSondModel as RefModel
    from funasr.models.sond.encoder.ci_scorers import DotScorer as RefDot
    from funasr.models.sond.encoder.conv_encoder import ConvEncoder as RefConv
    from funasr.models.sond.encoder.fsmn_encoder import FsmnEncoder as RefFsmn
    from funasr.models.sond.encoder.resnet34_encoder import \
        ResNet34SpL2RegDiar as RefResNet
    from funasr.models.sond.encoder.self_attention_encoder import \
        SelfAttentionEncoder as RefSAE

    from funasr_tpu.convert.torch_to_jax import convert_state_dict
    from funasr_tpu.models.sond.model import DiarSondModel

    enc = RefResNet(input_size=FEAT, layers_in_block=(1, 1, 1, 1),
                    filters_in_block=(4, 8, 8, 8), num_nodes_pooling_layer=D,
                    num_nodes_resnet1=D, num_nodes_last_layer=D,
                    pool_size=4, stride=1, embedding_node="resnet1_dense")
    spk_enc = RefConv(num_layers=2, input_units=SPK_DIM, num_units=D,
                      kernel_size=3, dropout_rate=0.0, activation="tanh")
    cd = RefSAE(input_size=2 * D, output_size=D, attention_heads=2,
                linear_units=32, num_blocks=2, input_layer="null",
                dropout_rate=0.0, positional_dropout_rate=0.0,
                attention_dropout_rate=0.0, out_units=1)
    dec = RefFsmn(in_units=2 * MAX_SPK, filter_size=5, fsmn_num_layers=2,
                  dnn_num_layers=1, num_memory_units=D, ffn_inner_dim=32,
                  dropout_rate=0.0, out_units=VOCAB)
    ref = RefModel(vocab_size=VOCAB, frontend=None, specaug=None,
                   profileaug=None, normalize=None, encoder=enc,
                   speaker_encoder=spk_enc, ci_scorer=RefDot(), cd_scorer=cd,
                   decoder=dec, token_list=TOKEN_LIST, max_spk_num=MAX_SPK,
                   label_aggregator=None, normalize_speech_speaker=False,
                   onfly_shuffle_speaker=False).eval()

    mine = DiarSondModel(
        token_list=TOKEN_LIST, input_size=FEAT, spk_embed_dim=SPK_DIM,
        max_spk_num=MAX_SPK,
        encoder="ResNet34SpL2RegDiar",
        encoder_conf=dict(layers_in_block=(1, 1, 1, 1),
                          filters_in_block=(4, 8, 8, 8),
                          num_nodes_pooling_layer=D, num_nodes_resnet1=D,
                          num_nodes_last_layer=D, pool_size=4, stride=1,
                          embedding_node="resnet1_dense"),
        speaker_encoder="ConvEncoder",
        speaker_encoder_conf=dict(num_layers=2, input_units=SPK_DIM,
                                  num_units=D, kernel_size=3,
                                  activation="tanh"),
        ci_scorer="DotScorer",
        cd_scorer="SelfAttentionEncoder",
        cd_scorer_conf=dict(input_size=2 * D, output_size=D,
                            attention_heads=2, linear_units=32, num_blocks=2,
                            input_layer="null", out_units=1),
        decoder="FsmnEncoder",
        decoder_conf=dict(in_units=2 * MAX_SPK, filter_size=5,
                          fsmn_num_layers=2, dnn_num_layers=1,
                          num_memory_units=D, ffn_inner_dim=32,
                          out_units=VOCAB))
    params = convert_state_dict(dict(ref.state_dict()), mine, "DiarSondModel")
    return ref, mine, params


def _inputs(rng, b=2, t=24):
    speech = rng.standard_normal((b, t, FEAT)).astype(np.float32)
    lens = np.array([t, t - 6], np.int32)
    profile = rng.standard_normal((b, MAX_SPK, SPK_DIM)).astype(np.float32)
    profile[1, -1] = 0.0  # an absent candidate slot
    plens = np.array([MAX_SPK, MAX_SPK - 1], np.int32)
    return speech, lens, profile, plens


def test_sond_speech_encoder_parity(pair, rng):
    ref, mine, params = pair
    speech, lens, _, _ = _inputs(rng)
    with torch.no_grad():
        want, want_lens, _ = ref.encoder(torch.from_numpy(speech),
                                         torch.from_numpy(lens))
    got, got_lens = mine.encoder(params["encoder"], speech, lens)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got_lens), want_lens.numpy())


def test_sond_prediction_forward_parity(pair, rng):
    ref, mine, params = pair
    speech, lens, profile, plens = _inputs(rng)
    with torch.no_grad():
        want = ref.prediction_forward(torch.from_numpy(speech),
                                      torch.from_numpy(lens),
                                      torch.from_numpy(profile),
                                      torch.from_numpy(plens))
    got = mine.prediction_forward(params, speech, lens, profile, plens)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=5e-4,
                               atol=5e-4)


def test_sond_training_loss_parity(pair, rng):
    ref, mine, params = pair
    speech, lens, profile, plens = _inputs(rng)
    t_enc = 3  # resnet time ds ratio 8: ceil(24/8)
    labels = (rng.random((2, t_enc, MAX_SPK)) < 0.4).astype(np.float32)
    lab_lens = np.array([t_enc, t_enc - 1], np.int32)
    with torch.no_grad():
        want_loss, want_stats, _ = ref(torch.from_numpy(speech),
                                       torch.from_numpy(lens),
                                       torch.from_numpy(profile),
                                       torch.from_numpy(plens),
                                       torch.from_numpy(labels),
                                       torch.from_numpy(lab_lens))
    loss, stats, _ = mine.forward_jit(params, speech, lens, profile, plens,
                                      labels, lab_lens)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-3)
    for k in ("loss_diar", "loss_spk_dis", "der", "acc"):
        np.testing.assert_allclose(float(stats[k]), float(want_stats[k]),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=f"stat {k} diverges")


def test_sond_inference_segments(pair, tmp_path, rng):
    _, mine, params = pair
    import scipy.io.wavfile as wavfile
    wav = (rng.standard_normal(16000) * 2000).astype(np.int16)
    path = str(tmp_path / "a.wav")
    wavfile.write(path, 16000, wav)
    profile = rng.standard_normal((MAX_SPK, SPK_DIM)).astype(np.float32)
    res, _ = mine.inference(params, [path], key=["a"], profile=profile)
    assert res[0]["key"] == "a"
    for spk, st, ed in res[0]["value"]:
        assert 0 <= spk < MAX_SPK and 0 <= st < ed
