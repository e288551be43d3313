"""Full-pipeline transcript parity vs the LIVE reference orchestration.

Builds tiny random-weight reference-layout model dirs (BiCifParaformer ASR +
FsmnVADStreaming + CTTransformer punc + CAMPPlus spk), runs the reference's
``AutoModel.generate`` -> ``inference_with_vad``
(``/root/reference/funasr/auto/auto_model.py:846-1194``) and OUR
``funasr_tpu.auto.AutoModel.generate`` on the same multi-segment synthetic
wav with the same converted weights, and asserts byte-equal ``text``,
ms-exact ``timestamp``, and identical ``sentence_info`` (text/spk/start/end).

This is the one test that catches orchestration drift — VAD segment offsets,
dynamic-batch restore order, punctuation re-alignment, timestamp offsetting,
speaker distribution — before real checkpoints arrive (VERDICT r3, Missing #2).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
]

sys.path.insert(0, os.path.dirname(__file__))


@pytest.fixture(scope="module")
def pipeline_results(tmp_path_factory):
    import pipeline_parity_util as U

    U.install_all_shims()

    root = tmp_path_factory.mktemp("parity")
    dirs = {}
    for name, builder in [("asr", U.build_bicif_asr_dir), ("vad", U.build_vad_dir),
                          ("punc", U.build_punc_dir), ("spk", U.build_spk_dir)]:
        d = str(root / name)
        os.makedirs(d, exist_ok=True)
        builder(d)
        dirs[name] = d

    wav = U.multi_segment_wav()
    common = dict(disable_update=True, disable_pbar=True, disable_log=True,
                  device="cpu")

    from funasr.auto.auto_model import AutoModel as RefAutoModel

    ref_m = RefAutoModel(model=dirs["asr"], vad_model=dirs["vad"],
                         punc_model=dirs["punc"], spk_model=dirs["spk"], **common)
    ref_res = ref_m.generate(input=wav.copy(), batch_size_s=300,
                             max_end_silence_time=800)

    from funasr_tpu.auto.auto_model import AutoModel

    our_m = AutoModel(model=dirs["asr"], vad_model=dirs["vad"],
                      punc_model=dirs["punc"], spk_model=dirs["spk"], **common)
    our_res = our_m.generate(input=wav.copy(), batch_size_s=300,
                             max_end_silence_time=800)
    return ref_res[0], our_res[0]


def test_transcript_text_equal(pipeline_results):
    ref, ours = pipeline_results
    assert ref["text"] == ours["text"]
    assert ref["text"], "pipeline must produce non-empty text for the test to bite"


def test_timestamps_ms_exact(pipeline_results):
    ref, ours = pipeline_results
    rt, ot = ref.get("timestamp"), ours.get("timestamp")
    assert rt is not None and ot is not None
    assert len(rt) >= 4, "need multiple tokens across segments"
    assert rt == ot


def test_sentence_info_identical(pipeline_results):
    ref, ours = pipeline_results
    rs, os_ = ref.get("sentence_info"), ours.get("sentence_info")
    assert rs is not None and os_ is not None
    assert len(rs) == len(os_) and len(rs) >= 2
    for a, b in zip(rs, os_):
        for k in ("text", "spk", "start", "end"):
            assert a.get(k) == b.get(k), (k, a, b)
    spks = {s["spk"] for s in rs}
    assert spks, "speaker ids must be assigned"
