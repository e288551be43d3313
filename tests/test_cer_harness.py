"""CER benchmark harness (++mode=cer, wav.scp + text pair) and the
real-checkpoint integration gate."""

import json
import os
import sys
import wave

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)
from conftest import stub_reference_deps  # noqa: E402

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

stub_reference_deps()


@pytest.fixture(scope="module")
def offline_automodel(tmp_path_factory):
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_auto_model import asr_dir as asr_fixture

    class FakeTPF:
        def mktemp(self, name):
            return tmp_path_factory.mktemp(name)

    d = asr_fixture.__wrapped__(FakeTPF())
    from funasr_tpu.auto.auto_model import AutoModel
    return AutoModel(model=d, disable_pbar=True)


def test_cer_harness_kaldi_pair(offline_automodel, tmp_path):
    """run_cer_eval over a wav.scp/text pair: self-referenced hyps score CER 0;
    a corrupted ref scores CER > 0; hyp_out is written per utt."""
    from funasr_tpu.bin.benchmark import run_cer_eval

    rng = np.random.default_rng(0)
    keys, paths = [], []
    for i in range(3):
        n = int(rng.integers(8000, 16000))
        sig = (rng.standard_normal(n) * 0.1 * 32767).astype(np.int16)
        p = tmp_path / f"utt{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes(sig.tobytes())
        keys.append(f"utt{i}")
        paths.append(str(p))

    # decode once to build a "reference" transcript set
    res = offline_automodel.generate(input=paths, key=list(keys))
    refs = {r["key"]: r["text"] for r in res}
    assert any(refs.values()), "tiny model produced no text at all"

    with open(tmp_path / "wav.scp", "w") as f:
        for k, p in zip(keys, paths):
            f.write(f"{k} {p}\n")
    with open(tmp_path / "text", "w", encoding="utf-8") as f:
        for k in keys:
            f.write(f"{k} {refs[k]}\n")

    report = run_cer_eval(offline_automodel, str(tmp_path / "wav.scp"),
                          str(tmp_path / "text"), batch_size=2,
                          hyp_out=str(tmp_path / "hyp"))
    assert report["cer"] == 0.0, report
    assert report["n_utts"] == 3 and report["rtfx"] > 0
    hyp_lines = open(tmp_path / "hyp", encoding="utf-8").read().splitlines()
    assert len(hyp_lines) == 3 and hyp_lines[0].startswith("utt0")

    # corrupt one ref -> nonzero CER
    with open(tmp_path / "text", "w", encoding="utf-8") as f:
        for j, k in enumerate(keys):
            f.write(f"{k} {refs[k] + ('卡' if j == 0 else '')}\n")
    report2 = run_cer_eval(offline_automodel, str(tmp_path / "wav.scp"),
                           str(tmp_path / "text"), batch_size=2)
    assert report2["cer"] > 0.0


CACHE = os.environ.get("FUNASR_TPU_CACHE", "")
_REAL = ""
if CACHE and os.path.isdir(CACHE):
    for name in sorted(os.listdir(CACHE)):
        d = os.path.join(CACHE, name)
        if "paraformer" in name.lower() and \
                os.path.exists(os.path.join(d, "model.pt")) and \
                os.path.exists(os.path.join(d, "config.yaml")):
            _REAL = d
            break


@pytest.mark.skipif(not _REAL, reason="no real checkpoint under $FUNASR_TPU_CACHE")
def test_real_checkpoint_cer():
    """North-star gate: a real production Paraformer checkpoint must transcribe
    the bundled example audio; when an AISHELL pair is provided via
    $FUNASR_TPU_AISHELL (dir with wav.scp + text), CER must be <= 2.5%
    (reference AISHELL-1 test CER 1.94 + 0.1 margin, BASELINE.md)."""
    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.bin.benchmark import run_cer_eval

    am = AutoModel(model=_REAL, disable_pbar=True)
    example = os.path.join(_REAL, "example", "asr_example.wav")
    if os.path.exists(example):
        res = am.generate(input=example)
        assert res and res[0]["text"].strip(), res

    aishell = os.environ.get("FUNASR_TPU_AISHELL", "")
    if aishell and os.path.isdir(aishell):
        report = run_cer_eval(am, os.path.join(aishell, "wav.scp"),
                              os.path.join(aishell, "text"), batch_size=16)
        print(json.dumps(report, ensure_ascii=False))
        assert report["cer"] <= 2.5, report


def test_streaming_latency_harness():
    """++mode=latency mechanics (realtime_ws_benchmark.md metric definitions):
    per-chunk percentiles over the steady state, first_update_ms at the first
    non-empty partial, RTF vs the chunk duration."""
    import time as _time

    from funasr_tpu.bin.benchmark import run_streaming_latency

    class StubStreaming:
        def __init__(self):
            self.calls = 0

        def generate(self, input, cache=None, is_final=False, **kwargs):
            self.calls += 1
            _time.sleep(0.01)
            # first two chunks produce no text (compile/window warmup role)
            return [{"text": "" if self.calls <= 2 else "好"}]

    stub = StubStreaming()
    report = run_streaming_latency(stub, chunk_ms=600, seconds=6.0,
                                   warmup_chunks=2)
    assert report["n_chunks"] == 10 and stub.calls == 10
    assert report["first_update_ms"] is not None
    assert report["first_update_ms"] >= 30  # after the 3rd chunk
    assert report["chunk_p50_ms"] >= 10
    assert report["chunk_p95_ms"] >= report["chunk_p50_ms"]
    assert report["rtf"] == round(report["chunk_p50_ms"] / 600, 4)
