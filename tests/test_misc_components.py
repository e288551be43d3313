"""Metrics, CTC forced alignment, MonotonicAligner, tokenizer extras."""

import jax
import numpy as np


def test_cer_wer():
    from funasr_tpu.metrics.wer import compute_cer, compute_wer, edit_distance
    assert edit_distance(list("abc"), list("abc"))[0] == 0
    assert edit_distance(list("abc"), list("axc"))[0] == 1
    r = compute_cer(["你好世界"], ["你好视界"])
    assert abs(r["cer"] - 0.25) < 1e-9
    w = compute_wer(["hello world"], ["hello there world"])
    assert abs(w["wer"] - 0.5) < 1e-9


def test_eer_min_dcf():
    from funasr_tpu.metrics.compute_eer import compute_eer, compute_min_dcf
    rng = np.random.default_rng(0)
    target = rng.normal(1.0, 0.3, 500)
    nontarget = rng.normal(-1.0, 0.3, 500)
    scores = np.concatenate([target, nontarget])
    labels = np.concatenate([np.ones(500), np.zeros(500)])
    eer, _ = compute_eer(scores, labels)
    assert eer < 0.05
    dcf, _ = compute_min_dcf(scores, labels)
    assert 0 <= dcf <= 1.1


def test_ctc_forced_align():
    from funasr_tpu.ops.ctc_align import ctc_forced_align
    # construct logits strongly favoring a known path
    t, v = 10, 5
    labels = np.array([2, 3])
    logp = np.full((t, v), -10.0)
    # frames 0-1 blank, 2-4 label 2, 5 blank, 6-8 label 3, 9 blank
    plan = [0, 0, 2, 2, 2, 0, 3, 3, 3, 0]
    for i, tok in enumerate(plan):
        logp[i, tok] = 0.0
    path = ctc_forced_align(logp, labels)
    assert list(path) == plan


def test_monotonic_aligner():
    from funasr_tpu.models.monotonic_aligner.model import MonotonicAligner
    from funasr_tpu.frontends.wav_frontend import WavFrontend
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer
    TOKENS = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(20)] + ["<unk>"]
    model = MonotonicAligner(
        input_size=560,
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, kernel_size=5),
        predictor_conf=dict(idim=16, upsample_times=3, upsample_type="cnn_blstm",
                            use_cif1_cnn=False),
        predictor_bias=1)
    params = model.init_params(jax.random.PRNGKey(0))
    tok = CharTokenizer(token_list=list(TOKENS))
    frontend = WavFrontend(fs=16000, lfr_m=7, lfr_n=6, n_mels=80, dither=0.0)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    res, _ = model.inference(params, [(wav, "一丁丂七")], tokenizer=tok,
                             frontend=frontend)
    assert len(res[0]["timestamp"]) == 4
