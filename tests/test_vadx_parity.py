"""Golden-trace parity: the C++ VADX endpoint machine (runtime vadx.cc) must
produce byte-identical segment lists to the Python tracker
(funasr_tpu/models/fsmn_vad_streaming/model.py) when driven with the SAME
per-frame score sequences — the state-machine half of the reference's
fsmn-vad.cpp port (scores were already byte-parity; this pins segmentation).

Scenarios: long silence, plain utterance, short bursts, max_single_segment
splitting, streaming partial events, empty/no-speech final flush.
"""

import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest

RUNTIME_DIR = os.path.join(os.path.dirname(__file__), "..", "runtime",
                           "funasr_tpu_runtime")

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(shutil.which("cmake") is None
                                 or shutil.which("g++") is None,
                                 reason="no C++ toolchain")]


@pytest.fixture(scope="module")
def lib(tmp_path_factory):
    build = tmp_path_factory.mktemp("vadxbuild")
    subprocess.run(["cmake", "-S", RUNTIME_DIR, "-B", str(build),
                    "-DCMAKE_BUILD_TYPE=Release"], check=True,
                   capture_output=True)
    subprocess.run(["cmake", "--build", str(build), "-j4"], check=True,
                   capture_output=True)
    lib = ctypes.CDLL(str(build / "libfunasr_tpu_runtime.so"))
    lib.FunVadXCreate.restype = ctypes.c_void_p
    lib.FunVadXCreate.argtypes = [ctypes.c_char_p]
    lib.FunVadXFeed.restype = ctypes.c_void_p
    lib.FunVadXFeed.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.FunASRGetResult.restype = ctypes.c_char_p
    lib.FunASRGetResult.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.FunASRFreeResult.argtypes = [ctypes.c_void_p]
    lib.FunVadXFree.argtypes = [ctypes.c_void_p]
    return lib


def _decibels(n_frames: int) -> np.ndarray:
    """Per-frame decibel of a constant waveform, via the python forward's
    formula (model.py:383-388) on a 1000-amplitude scaled signal."""
    w = np.full((n_frames * 160 + 240,), 1000.0, np.float32)
    db = []
    for i in range(n_frames):
        frame = w[i * 160: i * 160 + 400]
        db.append(10.0 * np.log10(float(np.sum(frame * frame)) + 1e-6))
    return np.asarray(db, np.float32)


def _run_python(chunks, streaming, **vad_kwargs):
    """Drive the python tracker with raw score chunks (encoder stubbed)."""
    from funasr_tpu.models.fsmn_vad_streaming.model import FsmnVADStreaming

    model = FsmnVADStreaming(
        encoder="FSMN",
        encoder_conf=dict(input_dim=400, input_affine_dim=16, fsmn_layers=1,
                          linear_dim=16, proj_dim=8, lorder=2, rorder=0,
                          lstride=1, rstride=1, output_affine_dim=16,
                          output_dim=4),
        **vad_kwargs)
    holder = {}

    def stub_encoder(params, feats, cache=None):
        scores = holder["scores"]
        out = np.zeros((1, len(scores), 1), np.float32)
        out[0, :, 0] = scores
        return out

    model.encoder = stub_encoder
    cache = {}
    model.init_cache(cache)
    events = []
    for k, (scores, is_final) in enumerate(chunks):
        holder["scores"] = np.asarray(scores, np.float32)
        t = len(scores)
        feats = np.zeros((1, t, 1), np.float32)
        waveform = np.full((t * 160 + 240,), 1000.0, np.float32)
        out = model.forward(params={"encoder": None}, feats=feats,
                            waveform=waveform, cache=cache, is_final=is_final,
                            is_streaming_input=streaming)
        if out:
            events.extend([list(x) for x in out[0]])
    return events


def _run_cpp(lib, chunks, streaming, config=""):
    import json

    h = lib.FunVadXCreate(config.encode())
    assert h
    events = []
    for scores, is_final in chunks:
        s = np.ascontiguousarray(scores, np.float32)
        db = _decibels(len(s))
        r = lib.FunVadXFeed(
            h, s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            db.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(s), int(is_final), int(streaming))
        assert r
        events.extend(json.loads(lib.FunASRGetResult(r, 0).decode()))
        lib.FunASRFreeResult(ctypes.c_void_p(r))
    lib.FunVadXFree(ctypes.c_void_p(h))
    return events


SIL, SPEECH = 0.95, 0.05


def _scenarios():
    """name -> (chunks [(scores, is_final)], streaming, vad_kwargs, config)."""
    scen = {}

    # 1. long leading silence, one utterance, trailing silence
    seq = [SIL] * 150 + [SPEECH] * 200 + [SIL] * 150
    scen["long_silence_offline"] = ([(seq, True)], False, {}, "")

    # 2. short bursts with gaps shorter than the end-silence budget
    seq = ([SIL] * 60 + ([SPEECH] * 30 + [SIL] * 45) * 3 + [SIL] * 120)
    scen["short_bursts_offline"] = ([(seq, True)], False, {}, "")

    # 3. max_single_segment split: 2 s cap over 6 s of continuous speech
    seq = [SIL] * 40 + [SPEECH] * 600 + [SIL] * 120
    scen["max_segment_split"] = (
        [(seq, True)], False, {"max_single_segment_time": 2000},
        "max_single_segment_time=2000")

    # 4. streaming partials: 100-frame chunks, open/close events
    seq = [SIL] * 80 + [SPEECH] * 250 + [SIL] * 150 + [SPEECH] * 120 + [SIL] * 200
    chunks = [(seq[i:i + 100], i + 100 >= len(seq))
              for i in range(0, len(seq), 100)]
    scen["streaming_partials"] = (chunks, True, {}, "")

    # 5. no speech at all -> fake start/end flush path, empty output
    scen["no_speech_final"] = ([([SIL] * 200, True)], False, {}, "")

    # 6. streaming with utterance still open at final (tail flush)
    seq = [SIL] * 60 + [SPEECH] * 180
    chunks = [(seq[i:i + 60], i + 60 >= len(seq))
              for i in range(0, len(seq), 60)]
    scen["streaming_open_tail"] = (chunks, True, {}, "")

    # 7. tighter end-silence budget (dynamic-schedule value applied statically)
    seq = [SIL] * 50 + [SPEECH] * 100 + [SIL] * 60 + [SPEECH] * 80 + [SIL] * 100
    scen["tight_end_silence"] = (
        [(seq, True)], False, {"max_end_silence_time": 400},
        "max_end_silence_time=400")

    return scen


@pytest.mark.parametrize("name", sorted(_scenarios()))
def test_vadx_segmentation_parity(lib, name):
    chunks, streaming, vad_kwargs, config = _scenarios()[name]
    py = _run_python(chunks, streaming, **vad_kwargs)
    cpp = _run_cpp(lib, chunks, streaming, config)
    assert py == cpp, f"{name}: python={py} cpp={cpp}"
    if name not in ("no_speech_final",):
        assert py, f"{name}: expected at least one event, got none"
