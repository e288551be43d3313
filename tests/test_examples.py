"""examples/ tree: every script parses, demos run offline against local tiny
model dirs, and the AISHELL recipe closes data-prep -> train -> CER end to end
(reference test strategy: recipe smoke via examples/aishell/*/run.sh,
SURVEY.md §4)."""

import glob
import os
import py_compile
import subprocess
import sys
import wave

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")

TOKENS = ["<blank>", "<s>", "</s>"] + list("的一是不了人我在有他") + ["<unk>"]


def _write_cmvn(path, dim):
    with open(path, "w") as f:
        zeros = " ".join("0.0" for _ in range(dim))
        ones = " ".join("1.0" for _ in range(dim))
        f.write(f"<Nnet>\n<Splice> {dim} {dim}\n[ 0 ]\n"
                f"<AddShift> {dim} {dim}\n<LearnRateCoef> 0 [ {zeros} ]\n"
                f"<Rescale> {dim} {dim}\n<LearnRateCoef> 0 [ {ones} ]\n</Nnet>\n")


@pytest.fixture(scope="module")
def tiny_asr_dir(tmp_path_factory):
    """Random-init tiny Paraformer model dir (config.yaml only — the demos
    must work against any local dir via FUNASR_TPU_DEMO_MODEL)."""
    d = tmp_path_factory.mktemp("demo_paraformer")
    with open(d / "tokens.txt", "w") as f:
        f.write("\n".join(TOKENS) + "\n")
    _write_cmvn(d / "am.mvn", 560)
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
        frontend_conf=dict(fs=16000, n_mels=80, lfr_m=7, lfr_n=6,
                           cmvn_file="am.mvn", dither=0.0),
        tokenizer="CharTokenizer",
        tokenizer_conf=dict(token_list="tokens.txt", unk_symbol="<unk>"),
    )
    with open(d / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f, allow_unicode=True)
    return str(d)


@pytest.fixture(scope="module")
def demo_wav(tmp_path_factory):
    d = tmp_path_factory.mktemp("demo_audio")
    path = str(d / "demo.wav")
    rng = np.random.default_rng(0)
    sig = (0.2 * np.sin(2 * np.pi * 440 * np.arange(32000) / 16000)
           + 0.01 * rng.standard_normal(32000))
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((sig * 32767).astype(np.int16).tobytes())
    return path


def _demo_env(tiny_asr_dir):
    env = dict(os.environ)
    env.update(FUNASR_TPU_DEMO_MODEL=tiny_asr_dir, FUNASR_TPU_DEMO_VAD="",
               FUNASR_TPU_DEMO_PUNC="", FUNASR_TPU_DEMO_SPK="",
               JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return env


def test_every_example_script_parses():
    pys = glob.glob(os.path.join(EXAMPLES, "**", "*.py"), recursive=True)
    shs = glob.glob(os.path.join(EXAMPLES, "**", "*.sh"), recursive=True)
    assert len(pys) >= 35 and len(shs) >= 40, (len(pys), len(shs))
    for p in pys:
        py_compile.compile(p, doraise=True)
    for s in shs:
        subprocess.run(["bash", "-n", s], check=True)


def test_industrial_tree_covers_reference_families():
    fams = {os.path.basename(p) for p in
            glob.glob(os.path.join(EXAMPLES, "industrial_data_pretraining", "*"))
            if os.path.isdir(p)}
    expected = {"paraformer", "bicif_paraformer", "campplus_sv", "conformer",
                "contextual_paraformer", "ct_transformer",
                "ct_transformer_streaming", "ctc", "emotion2vec",
                "eres2netv2_sv", "fsmn_kws", "fsmn_kws_mt",
                "fsmn_vad_streaming", "fun_asr_nano", "glm_asr", "lcbnet",
                "llm_asr", "monotonic_aligner", "paraformer-zh-spk",
                "paraformer_streaming", "qwen3_asr", "qwen_audio", "sanm_kws",
                "sanm_kws_streaming", "scama", "seaco_paraformer",
                "sense_voice", "transducer", "uniasr", "whisper"}
    missing = expected - fams
    assert not missing, missing
    for fam in expected:
        assert os.path.exists(os.path.join(
            EXAMPLES, "industrial_data_pretraining", fam, "demo.py")), fam
        assert os.path.exists(os.path.join(
            EXAMPLES, "industrial_data_pretraining", fam, "finetune.sh")), fam


def test_demo_paraformer_runs_offline(tiny_asr_dir, demo_wav):
    out = subprocess.run(
        [sys.executable,
         os.path.join(EXAMPLES, "industrial_data_pretraining", "paraformer",
                      "demo.py"), demo_wav],
        env=_demo_env(tiny_asr_dir), capture_output=True, text=True,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "text" in out.stdout, out.stdout


def test_subtitle_generator(tiny_asr_dir, demo_wav, tmp_path):
    srt = str(tmp_path / "demo.srt")
    out = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, "subtitle", "gen_subtitle.py"),
         demo_wav, srt],
        env=_demo_env(tiny_asr_dir), capture_output=True, text=True,
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    content = open(srt).read()
    assert "-->" in content and content.splitlines()[0].strip() == "1", content


def test_migrate_imports(tmp_path):
    src = tmp_path / "app.py"
    src.write_text("from funasr import AutoModel\n"
                   "from funasr.utils.postprocess_utils import x\n"
                   "import funasr\n")
    out = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, "migration",
                                      "migrate_imports.py"),
         str(tmp_path), "--apply"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    text = src.read_text()
    assert "from funasr_tpu import AutoModel" in text
    assert "from funasr_tpu.utils.postprocess_utils import x" in text
    assert "import funasr_tpu as funasr" in text


def test_recipe_configs_construct():
    """Every aishell conf builds its model through AutoModel.build_model
    (shrunken dims: key-compatibility check, not a size check)."""
    from funasr_tpu.auto.auto_model import AutoModel

    tok = os.path.join(EXAMPLES, "..", "tests", "_tokens_tmp.txt")
    confs = sorted(glob.glob(os.path.join(
        EXAMPLES, "aishell", "*", "conf", "*", "config.yaml")))
    assert len(confs) == 6, confs
    try:
        with open(tok, "w") as f:
            f.write("\n".join(TOKENS) + "\n")
        for cfg_path in confs:
            with open(cfg_path) as f:
                cfg = yaml.safe_load(f)
            shrink_enc = dict(cfg["encoder_conf"], num_blocks=2, output_size=32,
                              attention_heads=2)
            for k in ("linear_units", "cgmlp_linear_units"):
                if k in shrink_enc:
                    shrink_enc[k] = 64
            kwargs = dict(
                model=os.path.dirname(cfg_path),
                tokenizer_conf={"token_list": tok, "unk_symbol": "<unk>"},
                encoder_conf=shrink_enc,
                decoder_conf=dict(cfg["decoder_conf"], num_blocks=2,
                                  linear_units=64, attention_heads=2))
            if "predictor_conf" in cfg:
                kwargs["predictor_conf"] = dict(cfg["predictor_conf"], idim=32)
            model, params, _ = AutoModel.build_model(**kwargs)
            assert params, cfg_path
    finally:
        if os.path.exists(tok):
            os.remove(tok)


@pytest.mark.slow
def test_aishell_recipe_end_to_end(tmp_path):
    """Full run.sh: data prep -> jsonl -> CMVN -> dict -> train -> CER eval,
    on a synthetic mini-AISHELL with a shrunken paraformer conf."""
    rng = np.random.default_rng(0)
    base = tmp_path / "raw_data" / "data_aishell"
    chars = "的一是不了人"
    freqs = [300, 500, 800, 1200, 1800, 2500]
    texts = {}
    for split, n in (("train", 6), ("dev", 2), ("test", 2)):
        d = base / "wav" / split / "S0001"
        d.mkdir(parents=True)
        for i in range(n):
            utt = f"{split}UTT{i:03d}"
            seq = [int(rng.integers(0, 6)) for _ in range(3)]
            texts[utt] = "".join(chars[s] for s in seq)
            sig = np.concatenate([
                0.3 * np.sin(2 * np.pi * freqs[s] * np.arange(4800) / 16000)
                for s in seq])
            with wave.open(str(d / f"{utt}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes((sig * 32767).astype(np.int16).tobytes())
    (base / "transcript").mkdir()
    with open(base / "transcript" / "aishell_transcript_v0.8.txt", "w") as f:
        for u, t in texts.items():
            f.write(f"{u} {' '.join(t)}\n")

    conf = tmp_path / "tinyconf"
    conf.mkdir()
    with open(os.path.join(EXAMPLES, "aishell", "paraformer", "conf",
                           "paraformer_conformer_12e_6d_2048_256",
                           "config.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["encoder_conf"].update(num_blocks=2, output_size=32, linear_units=64,
                               attention_heads=2)
    cfg["decoder_conf"].update(num_blocks=2, linear_units=64,
                               attention_heads=2)
    cfg["predictor_conf"]["idim"] = 32
    cfg["dataset_conf"].update(batch_type="example", batch_size=6)
    cfg["train_conf"].update(max_epoch=1, avg_nbest_model=1)
    cfg["specaug"] = None
    with open(conf / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f, allow_unicode=True)

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    out = subprocess.run(
        ["bash", os.path.join(EXAMPLES, "aishell", "paraformer", "run.sh"),
         f"raw_data={tmp_path}/raw_data", f"feats_dir={tmp_path}/DATA",
         f"exp_dir={tmp_path}/exp", f"config={conf}", "test_sets=test"],
        env=env, capture_output=True, text=True, timeout=1500)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])
    assert '"mode": "cer"' in out.stdout, out.stdout[-2000:]
    # the eval loaded a real checkpoint (not random init)
    exp = glob.glob(f"{tmp_path}/exp/exp/*/model.pt.*")
    assert exp, out.stdout[-1500:]
