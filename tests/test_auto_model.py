"""AutoModel end-to-end tests against synthetic local model directories
(config.yaml + model.pt + tokens), covering build, generate, and the VAD+ASR+PUNC
pipeline with batch_size_s dynamic batching."""

import os
import sys
import types

import numpy as np
import pytest
import yaml

REF = "/root/reference"
torch = pytest.importorskip("torch")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)
from conftest import stub_reference_deps  # noqa: E402

stub_reference_deps()

TOKENS = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(60)] + ["<unk>"]

CMVN_DIM = 560


def _write_cmvn(path, dim):
    means = " ".join(["0.0"] * dim)
    istd = " ".join(["1.0"] * dim)
    with open(path, "w") as f:
        f.write(f"<Nnet>\n<Splice> {dim} {dim}\n[ 0 ]\n"
                f"<AddShift> {dim} {dim}\n<LearnRateCoef> 0 [ {means} ]\n"
                f"<Rescale> {dim} {dim}\n<LearnRateCoef> 0 [ {istd} ]\n</Nnet>\n")


@pytest.fixture(scope="module")
def asr_dir(tmp_path_factory):
    """Tiny Paraformer model dir with reference-layout model.pt."""
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("paraformer_tiny")
    from funasr.models.sanm.encoder import SANMEncoder as RefEnc
    from funasr.models.paraformer.decoder import ParaformerSANMDecoder as RefDec
    from funasr.models.paraformer.cif_predictor import CifPredictorV2 as RefCif

    enc = RefEnc(input_size=560, output_size=32, attention_heads=4, linear_units=64,
                 num_blocks=2, input_layer="pe", kernel_size=11, sanm_shfit=0)
    dec = RefDec(vocab_size=len(TOKENS), encoder_output_size=32, attention_heads=4,
                 linear_units=64, num_blocks=2, att_layer_num=2, kernel_size=11,
                 sanm_shfit=0)
    cif = RefCif(idim=32, l_order=1, r_order=1, threshold=1.0, tail_threshold=0.45)
    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec), ("predictor", cif)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    torch.save(sd, d / "model.pt")
    with open(d / "tokens.txt", "w") as f:
        f.write("\n".join(TOKENS) + "\n")
    _write_cmvn(d / "am.mvn", CMVN_DIM)
    cfg = dict(
        model="Paraformer",
        model_conf=dict(sos=1, eos=2, predictor_bias=1, ctc_weight=0.0),
        encoder="SANMEncoder",
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=64,
                          num_blocks=2, input_layer="pe", kernel_size=11,
                          sanm_shfit=0),
        decoder="ParaformerSANMDecoder",
        decoder_conf=dict(attention_heads=4, linear_units=64, num_blocks=2,
                          att_layer_num=2, kernel_size=11, sanm_shfit=0),
        predictor="CifPredictorV2",
        predictor_conf=dict(idim=32, l_order=1, r_order=1, threshold=1.0,
                            tail_threshold=0.45),
        frontend="WavFrontend",
        frontend_conf=dict(fs=16000, window="hamming", n_mels=80, frame_length=25,
                           frame_shift=10, lfr_m=7, lfr_n=6, cmvn_file="am.mvn",
                           dither=0.0),
        tokenizer="CharTokenizer",
        tokenizer_conf=dict(token_list="tokens.txt", unk_symbol="<unk>"),
    )
    with open(d / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f, allow_unicode=True)
    return str(d)


@pytest.fixture(scope="module")
def vad_dir(tmp_path_factory):
    torch.manual_seed(1)
    d = tmp_path_factory.mktemp("fsmn_vad_tiny")
    from funasr.models.fsmn_vad_streaming.encoder import FSMN as RefFSMN
    enc_conf = dict(input_dim=400, input_affine_dim=140, fsmn_layers=4, linear_dim=250,
                    proj_dim=128, lorder=20, rorder=0, lstride=1, rstride=1,
                    output_affine_dim=140, output_dim=248)
    enc = RefFSMN(**enc_conf)
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    torch.save(sd, d / "model.pt")
    _write_cmvn(d / "am.mvn", 400)
    cfg = dict(
        model="FsmnVADStreaming",
        model_conf=dict(max_end_silence_time=800, speech_noise_thres=0.6,
                        sil_pdf_ids=[0]),
        encoder="FSMN", encoder_conf=enc_conf,
        frontend="WavFrontendOnline",
        frontend_conf=dict(fs=16000, window="hamming", n_mels=80, frame_length=25,
                           frame_shift=10, lfr_m=5, lfr_n=1, cmvn_file="am.mvn",
                           dither=0.0),
    )
    with open(d / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f, allow_unicode=True)
    return str(d)


@pytest.fixture(scope="module")
def punc_dir(tmp_path_factory):
    torch.manual_seed(2)
    d = tmp_path_factory.mktemp("ct_punc_tiny")
    from funasr.models.ct_transformer.model import CTTransformer as RefPunc
    conf = dict(
        encoder="SANMEncoder",
        encoder_conf=dict(input_size=32, output_size=32, attention_heads=4,
                          linear_units=64, num_blocks=2, input_layer="pe",
                          kernel_size=11, sanm_shfit=0),
        vocab_size=len(TOKENS), punc_list=["<unk>", "_", "，", "。", "？", "、"],
        embed_unit=32, att_unit=32, sentence_end_id=3)
    ref = RefPunc(**conf)
    torch.save(ref.state_dict(), d / "model.pt")
    with open(d / "tokens.txt", "w") as f:
        f.write("\n".join(TOKENS) + "\n")
    cfg = dict(model="CTTransformer",
               model_conf=dict(punc_list=conf["punc_list"], embed_unit=32,
                               att_unit=32, sentence_end_id=3),
               encoder="SANMEncoder", encoder_conf=conf["encoder_conf"],
               tokenizer="CharTokenizer",
               tokenizer_conf=dict(token_list="tokens.txt", unk_symbol="<unk>"))
    with open(d / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f, allow_unicode=True)
    return str(d)


def _speechy_audio(seconds=4.0, seed=0):
    rng = np.random.default_rng(seed)
    n = int(seconds * 16000)
    wav = rng.standard_normal(n).astype(np.float32) * 3e-4
    for beg, end in [(0.3, 1.6), (2.2, 3.5)]:
        i, j = int(beg * 16000), min(int(end * 16000), n)
        if j <= i:
            continue
        t = np.arange(j - i) / 16000
        wav[i:j] += (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    return wav


def test_automodel_basic(asr_dir):
    from funasr_tpu.auto.auto_model import AutoModel
    m = AutoModel(model=asr_dir, disable_update=True)
    res = m.generate(input=_speechy_audio())
    assert len(res) == 1 and "text" in res[0]


def test_automodel_int16_pcm_input_matches_float(asr_dir):
    """Raw int16 PCM ndarray input (half the upload bytes; converted on
    device) transcribes identically to the equivalent float input."""
    from funasr_tpu.auto.auto_model import AutoModel
    m = AutoModel(model=asr_dir, disable_update=True)
    wav = _speechy_audio()
    pcm = np.clip(wav * 32768.0, -32768, 32767).astype(np.int16)
    res_f = m.generate(input=pcm.astype(np.float32) / 32768.0)
    res_i = m.generate(input=pcm)
    assert res_i[0]["text"] == res_f[0]["text"]


def test_automodel_batch_and_keys(asr_dir):
    from funasr_tpu.auto.auto_model import AutoModel
    m = AutoModel(model=asr_dir, batch_size=2)
    res = m.generate(input=[_speechy_audio(2.0, 1), _speechy_audio(3.0, 2)])
    assert len(res) == 2


def test_automodel_pipeline_vad_punc(asr_dir, vad_dir, punc_dir):
    from funasr_tpu.auto.auto_model import AutoModel
    m = AutoModel(model=asr_dir, vad_model=vad_dir, punc_model=punc_dir,
                  disable_pbar=True)
    res = m.generate(input=_speechy_audio(6.0), batch_size_s=300)
    assert len(res) == 1
    assert "text" in res[0]
    # with random weights the VAD labels everything speech; text may be long or empty
    # the contract we check: pipeline runs end-to-end, key present, no crash
    assert "key" in res[0]


def test_automodel_config_restore(asr_dir):
    """Per-call cfg overrides must not leak into later calls (reference
    ``auto_model.py:1312-1353`` snapshot/restore)."""
    from funasr_tpu.auto.auto_model import AutoModel
    m = AutoModel(model=asr_dir)
    base_bs = m.kwargs.get("batch_size", 1)
    m.generate(input=_speechy_audio(2.0), batch_size=7)
    m._reset_runtime_configs()
    assert m.kwargs.get("batch_size", 1) == base_bs
