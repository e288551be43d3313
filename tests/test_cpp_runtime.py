"""C++ runtime build + DSP golden parity vs the JAX pipeline.

Builds runtime/funasr_tpu_runtime with cmake, writes golden vectors from the Python
fbank+LFR+CMVN, runs the C++ test binary, and also exercises the C API via ctypes.
"""

import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest

RUNTIME_DIR = os.path.join(os.path.dirname(__file__), "..", "runtime",
                           "funasr_tpu_runtime")

pytestmark = pytest.mark.skipif(shutil.which("cmake") is None
                                or shutil.which("g++") is None,
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    build = tmp_path_factory.mktemp("cppbuild")
    subprocess.run(["cmake", "-S", RUNTIME_DIR, "-B", str(build),
                    "-DCMAKE_BUILD_TYPE=Release"], check=True,
                   capture_output=True)
    subprocess.run(["cmake", "--build", str(build), "-j4"], check=True,
                   capture_output=True)
    return build


def _golden(tmp_path):
    import jax.numpy as jnp
    from funasr_tpu.ops.fbank import fbank
    from funasr_tpu.ops.lfr import apply_lfr

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    # quantize like the PCM16 round-trip the C++ test performs
    wav = np.round(wav * 32767.0) / 32768.0 * (32767.0 / 32767.0)
    wav_q = (np.round(wav * 32767.0) / 32768.0).astype(np.float32)
    mel = np.asarray(fbank(jnp.asarray(wav_q * 32768.0)))
    feats = np.asarray(apply_lfr(jnp.asarray(mel), 7, 6))
    means = np.zeros(560, np.float32) + 0.5
    istd = np.full(560, 0.25, np.float32)
    feats = (feats + means) * istd
    mvn = tmp_path + "/golden_am.mvn"
    with open(mvn, "w") as f:
        m = " ".join("0.5" for _ in range(560))
        s = " ".join("0.25" for _ in range(560))
        f.write(f"<Nnet>\n<Splice> 560 560\n[ 0 ]\n<AddShift> 560 560\n"
                f"<LearnRateCoef> 0 [ {m} ]\n<Rescale> 560 560\n"
                f"<LearnRateCoef> 0 [ {s} ]\n</Nnet>\n")
    wav.astype(np.float32).tofile(tmp_path + "/golden_wave.bin")
    feats.astype(np.float32).tofile(tmp_path + "/golden_feats.bin")
    return wav, feats


def test_dsp_golden_parity(built, tmp_path):
    _golden(str(tmp_path))
    out = subprocess.run([str(built / "test_dsp"), str(tmp_path)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "PASS" in out.stdout, out.stdout


def test_c_api_via_ctypes(built):
    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRVersion.restype = ctypes.c_char_p
    assert b"funasr-tpu-runtime" in lib.FunASRVersion()

    lib.FunASRFrontendInit.restype = ctypes.c_void_p
    lib.FunASRFrontendInit.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int]
    lib.FunFrontendExtract.restype = ctypes.c_void_p
    lib.FunFrontendExtract.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_int, ctypes.c_int]
    lib.FunASRGetFeatureFrames.argtypes = [ctypes.c_void_p]
    lib.FunASRGetFeatureDim.argtypes = [ctypes.c_void_p]
    lib.FunASRFreeResult.argtypes = [ctypes.c_void_p]
    lib.FunASRUninit.argtypes = [ctypes.c_void_p]

    h = lib.FunASRFrontendInit(b"", 80, 7, 6)
    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal(16000) * 3000).astype(np.int16).tobytes()
    r = lib.FunFrontendExtract(h, pcm, len(pcm), 16000)
    assert r
    frames = lib.FunASRGetFeatureFrames(r)
    dim = lib.FunASRGetFeatureDim(r)
    assert dim == 560 and frames == int(np.ceil(98 / 6))
    lib.FunASRFreeResult(r)
    lib.FunASRUninit(h)
