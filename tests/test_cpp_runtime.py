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

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(shutil.which("cmake") is None
                                 or shutil.which("g++") is None,
                                 reason="no C++ toolchain")]


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


def test_amx_int8_gemm(built):
    """AMX-INT8 GEMM backend: exact vs an int64 integer reference (the only
    float math is the final dequant scale). Skips cleanly on hosts without
    the TMUL unit — the engines then use the portable widened-float path."""
    env = dict(os.environ, FUNASR_TPU_AMX_BF16="1")  # cover the bf16 branch
    out = subprocess.run([str(built / "test_amx")], capture_output=True,
                         text=True, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert ("all AMX tests passed" in out.stdout
            or "SKIP" in out.stdout), out.stdout


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


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    """Tiny Paraformer dir (config.yaml + reference-layout model.pt)."""
    import pathlib
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_auto_model import asr_dir as asr_fixture

    class FakeTPF:
        def mktemp(self, name):
            return tmp_path_factory.mktemp(name)

    return asr_fixture.__wrapped__(FakeTPF())


@pytest.mark.parametrize("quant", [None, "int8"])
def test_native_engine_transcribes(built, tiny_model_dir, tmp_path, quant):
    """The pure-C++ engine (weights.ftr) produces the SAME transcript as the
    JAX AutoModel pipeline — the neural path the round-1 runtime lacked
    (reference role: runtime/onnxruntime/src/paraformer.cpp:428 Forward)."""
    import wave

    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.export_runtime import export_native_dir

    am = AutoModel(model=tiny_model_dir, disable_pbar=True)
    out_dir = str(tmp_path / f"native_{quant}")
    export_native_dir(am.model, am.model_params, tiny_model_dir, out_dir,
                      quant=quant)

    rng = np.random.default_rng(9)
    sig = (rng.standard_normal(24000) * 0.1 * 32767).astype(np.int16)
    wav_path = str(tmp_path / "t.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.tobytes())

    py_text = am.generate(input=wav_path)[0]["text"]
    assert py_text.strip(), "tiny model produced no text"

    cli = str(built / "funasr-tpu-offline")
    r = subprocess.run([cli, out_dir, wav_path], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    cpp_text = r.stdout.strip().split("\t")[-1]
    assert cpp_text.replace(" ", "") == py_text.replace(" ", ""), \
        (cpp_text, py_text)


def test_native_engine_int4(built, tiny_model_dir, tmp_path):
    """int4 FTR (ggml-Q4 role): half the int8 bytes, loads through the same
    engine, and still decodes. Transcript parity budget is looser than int8
    (values in [-7,7]) so only decode success + size are pinned here; the
    nibble-pack math itself is pinned exactly in test_export_runtime_mcp."""
    import wave

    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.export_runtime import export_native_dir

    am = AutoModel(model=tiny_model_dir, disable_pbar=True)
    # the tiny fixture's matmuls are below the production _QUANT_MIN_SIZE
    # gate; lower it so the size/parity comparison actually exercises quant
    import funasr_tpu.export_runtime as er
    old_gate = er._QUANT_MIN_SIZE
    er._QUANT_MIN_SIZE = 256
    dirs = {}
    try:
        for q in ("int8", "int4"):
            dirs[q] = str(tmp_path / f"native_{q}")
            export_native_dir(am.model, am.model_params, tiny_model_dir,
                              dirs[q], quant=q)
    finally:
        er._QUANT_MIN_SIZE = old_gate
    sz8 = os.path.getsize(os.path.join(dirs["int8"], "weights.ftr"))
    sz4 = os.path.getsize(os.path.join(dirs["int4"], "weights.ftr"))
    assert sz4 < sz8 * 0.75, (sz4, sz8)

    rng = np.random.default_rng(9)
    sig = (rng.standard_normal(24000) * 0.1 * 32767).astype(np.int16)
    wav_path = str(tmp_path / "t4.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.tobytes())

    cli = str(built / "funasr-tpu-offline")
    r = subprocess.run([cli, dirs["int4"], wav_path], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip(), "int4 engine produced no output line"


def test_native_engine_int3_int2(built, tiny_model_dir, tmp_path):
    """Sub-4-bit FTR (ggml Q2_K/Q3_K role): group-32 quantization — int3
    symmetric, int2 asymmetric (scale+min) — completes the reference edge
    runtime's 2-8 bit spectrum (``runtime/llama.cpp/DESIGN.md``). The C++
    loader reconstructs f32 and requantizes per-column int8, so the same
    engine decodes; pinned: strictly shrinking file sizes + decode success
    + group-quant reconstruction error bounds."""
    import wave

    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.export_runtime import (_group_quant_asym2,
                                           _group_quant_sym, _pack3,
                                           export_native_dir)

    # reconstruction bounds of the group quantizers themselves
    rng = np.random.default_rng(3)
    w = (rng.standard_normal((64, 96)) * 0.2).astype(np.float32)
    v, q3, s3 = _group_quant_sym(w, levels=3)
    rec3 = (q3.reshape(len(s3), -1) * s3[:, None]).reshape(-1)[: w.size]
    assert np.abs(rec3 - w.reshape(-1)).max() <= (np.abs(w).max() / 3) * 0.51
    packed = _pack3(q3)
    assert packed.size == (q3.size // 8) * 3
    q2, s2, m2 = _group_quant_asym2(w)
    rec2 = (q2.reshape(len(s2), -1) * s2[:, None]
            + m2[:, None]).reshape(-1)[: w.size]
    # asymmetric 4-level: error bounded by half a step of the widest group
    assert np.abs(rec2 - w.reshape(-1)).max() <= s2.max() * 0.51

    am = AutoModel(model=tiny_model_dir, disable_pbar=True)
    import funasr_tpu.export_runtime as er
    old_gate = er._QUANT_MIN_SIZE
    er._QUANT_MIN_SIZE = 256
    dirs = {}
    try:
        for q in ("int4", "int3", "int2"):
            dirs[q] = str(tmp_path / f"native_{q}")
            export_native_dir(am.model, am.model_params, tiny_model_dir,
                              dirs[q], quant=q)
    finally:
        er._QUANT_MIN_SIZE = old_gate
    sizes = {q: os.path.getsize(os.path.join(d, "weights.ftr"))
             for q, d in dirs.items()}
    assert sizes["int3"] < sizes["int4"], sizes
    assert sizes["int2"] < sizes["int3"], sizes

    rng = np.random.default_rng(9)
    sig = (rng.standard_normal(24000) * 0.1 * 32767).astype(np.int16)
    wav_path = str(tmp_path / "t23.wav")
    with wave.open(wav_path, "wb") as w2:
        w2.setnchannels(1)
        w2.setsampwidth(2)
        w2.setframerate(16000)
        w2.writeframes(sig.tobytes())
    cli = str(built / "funasr-tpu-offline")
    for q in ("int3", "int2"):
        r = subprocess.run([cli, dirs[q], wav_path], capture_output=True,
                           text=True)
        assert r.returncode == 0, (q, r.stderr)
        assert r.stdout.strip(), f"{q} engine produced no output line"


def test_native_engine_c_api_text(built, tiny_model_dir, tmp_path):
    """FunOfflineInfer returns non-empty transcript text through ctypes."""
    import wave

    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.export_runtime import export_native_dir

    am = AutoModel(model=tiny_model_dir, disable_pbar=True)
    out_dir = str(tmp_path / "native_api")
    export_native_dir(am.model, am.model_params, tiny_model_dir, out_dir)

    rng = np.random.default_rng(3)
    sig = (rng.standard_normal(16000) * 0.1 * 32767).astype(np.int16)
    wav_path = str(tmp_path / "t.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.tobytes())

    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRInit.restype = ctypes.c_void_p
    lib.FunASRInit.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.FunOfflineInfer.restype = ctypes.c_void_p
    lib.FunOfflineInfer.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.FunASRGetResult.restype = ctypes.c_char_p
    lib.FunASRGetResult.argtypes = [ctypes.c_void_p, ctypes.c_int]

    h = lib.FunASRInit(out_dir.encode(), 1)
    assert h
    data = open(wav_path, "rb").read()
    res = lib.FunOfflineInfer(h, data, len(data), 0, 16000)
    assert res
    text = lib.FunASRGetResult(res, 0).decode()
    assert text.strip(), "FunOfflineInfer returned empty text"
    py_text = am.generate(input=wav_path)[0]["text"]
    assert text.replace(" ", "") == py_text.replace(" ", "")
    lib.FunASRFreeResult(ctypes.c_void_p(res))
    lib.FunASRUninit(ctypes.c_void_p(h))


def test_hotword_aho_corasick(built, tmp_path):
    """Failure links: overlapping hotwords keep their boost ("abcd" earns the
    full "bcd" completion even while "abx" was being matched), and dead-end
    partial matches stay score-neutral."""
    tokens = tmp_path / "hw_tokens.txt"
    tokens.write_text("\n".join(list("abcdxyz")))
    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRHotwordCompile.restype = ctypes.c_void_p
    lib.FunASRHotwordCompile.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_float]
    lib.FunASRHotwordStep.restype = ctypes.c_int
    lib.FunASRHotwordStep.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_float)]
    trie = lib.FunASRHotwordCompile(b"abx bcd", str(tokens).encode(), 2.0)
    assert trie
    tok = {ch: i for i, ch in enumerate("abcdxyz")}

    def run(seq):
        state, total = 0, 0.0
        for ch in seq:
            d = ctypes.c_float(0.0)
            state = lib.FunASRHotwordStep(trie, state, tok[ch],
                                          ctypes.byref(d))
            total += d.value
        return total

    assert abs(run("abcd") - 6.0) < 1e-4   # bcd completes via the fail link
    assert abs(run("abz")) < 1e-4          # dead end refunds everything
    assert abs(run("abx") - 6.0) < 1e-4    # plain completion
    lib.FunASRHotwordFree(ctypes.c_void_p(trie))


def test_native_vad_engine(built, tmp_path, rng):
    """C++ FSMN-VAD engine: per-frame silence scores match the JAX encoder and
    FunVadInfer emits a JSON segment list."""
    import wave

    import jax
    import jax.numpy as jnp

    from funasr_tpu.export_runtime import export_vad_ftr
    from funasr_tpu.models.fsmn_vad_streaming.model import FsmnVADStreaming
    from funasr_tpu.ops.fbank import fbank
    from funasr_tpu.ops.lfr import apply_lfr

    model = FsmnVADStreaming(
        encoder="FSMN",
        encoder_conf=dict(input_dim=400, input_affine_dim=64, fsmn_layers=2,
                          linear_dim=64, proj_dim=32, lorder=10, rorder=0,
                          lstride=1, rstride=1, output_affine_dim=64,
                          output_dim=8))
    params = model.init_params(jax.random.PRNGKey(3))
    model_dir = tmp_path / "vadmodel"
    model_dir.mkdir()
    export_vad_ftr(model, params, str(model_dir / "vad.ftr"),
                   extra_meta={"n_mels": 80, "lfr_m": 5, "lfr_n": 1})

    # PCM16 speech-shaped noise
    wav_f = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    pcm = (np.clip(wav_f, -1, 1) * 32767).astype(np.int16)
    wav_path = str(tmp_path / "v.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    # python-side reference scores on the same PCM16 waveform
    wav_q = pcm.astype(np.float32) / 32768.0
    mel = np.asarray(fbank(jnp.asarray(wav_q * 32768.0)))
    feats = np.asarray(apply_lfr(jnp.asarray(mel), 5, 1))[None]
    scores = np.asarray(model.encoder(params["encoder"], jnp.asarray(feats)))
    sil_py = scores[0, :, 0]

    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRInit.restype = ctypes.c_void_p
    lib.FunASRInit.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.FunVadInfer.restype = ctypes.c_void_p
    lib.FunVadInfer.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_int, ctypes.c_int]
    lib.FunASRGetResult.restype = ctypes.c_char_p
    lib.FunASRGetResult.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.FunASRGetFeatureData.restype = ctypes.POINTER(ctypes.c_float)
    lib.FunASRGetFeatureData.argtypes = [ctypes.c_void_p]
    lib.FunASRGetFeatureFrames.restype = ctypes.c_int
    lib.FunASRGetFeatureFrames.argtypes = [ctypes.c_void_p]
    lib.FunASRGetSegmentCount.restype = ctypes.c_int
    lib.FunASRGetSegmentCount.argtypes = [ctypes.c_void_p]

    h = lib.FunASRInit(str(model_dir).encode(), 1)
    data = open(wav_path, "rb").read()
    res = lib.FunVadInfer(h, data, len(data), 16000)
    assert res, "FunVadInfer returned null (vad.ftr not loaded?)"
    t = lib.FunASRGetFeatureFrames(res)
    assert t == len(sil_py), (t, len(sil_py))
    sil_cpp = np.ctypeslib.as_array(lib.FunASRGetFeatureData(res),
                                    shape=(t,)).copy()
    np.testing.assert_allclose(sil_cpp, sil_py, rtol=1e-4, atol=1e-4)

    import json
    segs = json.loads(lib.FunASRGetResult(res, 0).decode())
    assert isinstance(segs, list)
    assert len(segs) == lib.FunASRGetSegmentCount(res)
    for s, e in segs:
        assert 0 <= s < e


def test_native_punc_engine(built, tmp_path):
    """C++ CT-Transformer punc engine: punctuated text byte-matches the JAX
    model's inference across mini-sentence windows, and FunOfflineInfer picks
    the punc model up automatically when punc.ftr is present."""
    import types

    import jax

    from funasr_tpu.export_runtime import export_punc_ftr
    from funasr_tpu.models.ct_transformer.model import CTTransformer

    zh = [chr(c) for c in range(ord("一"), ord("一") + 30)]
    en = ["hello", "world", "speech", "model", "test", "jax"]
    token_list = ["<blank>", "<unk>"] + zh + en
    tok = types.SimpleNamespace(
        token2id={t: i for i, t in enumerate(token_list)}, unk_id=1)

    model = CTTransformer(
        vocab_size=len(token_list), embed_unit=16, att_unit=32,
        punc_list=["<unk>", "_", "，", "。", "？", "、"],
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=48,
                          num_blocks=2, kernel_size=7, input_size=16))
    params = model.init_params(jax.random.PRNGKey(11))

    model_dir = tmp_path / "puncmodel"
    model_dir.mkdir()
    export_punc_ftr(model, params, str(model_dir / "punc.ftr"),
                    token_list=token_list)

    # 47 words (3 windows), mixed zh/en plus an OOV word
    rng_py = np.random.default_rng(7)
    words = [str(rng_py.choice(zh + en)) for _ in range(46)] + ["oov"]
    text = " ".join(words)
    out_py = model.inference(params, [text], tokenizer=tok)[0][0]["text"]

    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRInit.restype = ctypes.c_void_p
    lib.FunASRInit.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.FunPuncInfer.restype = ctypes.c_void_p
    lib.FunPuncInfer.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.FunASRGetResult.restype = ctypes.c_char_p
    lib.FunASRGetResult.argtypes = [ctypes.c_void_p, ctypes.c_int]

    h = lib.FunASRInit(str(model_dir).encode(), 1)
    res = lib.FunPuncInfer(h, text.encode())
    assert res, "FunPuncInfer returned null (punc.ftr not loaded?)"
    out_cpp = lib.FunASRGetResult(res, 0).decode()
    assert out_cpp == out_py, (out_cpp, out_py)

    # short input (single window) as well
    short = " ".join(words[:5])
    out_py_s = model.inference(params, [short], tokenizer=tok)[0][0]["text"]
    res_s = lib.FunPuncInfer(h, short.encode())
    assert lib.FunASRGetResult(res_s, 0).decode() == out_py_s


def test_cpp_ws_server_2pass(built, tmp_path):
    """Drive the C++ websocket server over a real socket: 2pass partials +
    final transcript from the native Paraformer engine (VAD engine loaded for
    mid-stream segment cuts)."""
    import asyncio
    import json as jsonlib
    import socket
    import time

    import jax

    from funasr_tpu import tables
    from funasr_tpu.export_runtime import export_ftr, export_vad_ftr
    from funasr_tpu.models.fsmn_vad_streaming.model import FsmnVADStreaming
    from funasr_tpu.serving.ws_protocol import connect

    model_dir = tmp_path / "wsmodel"
    model_dir.mkdir()
    tokens = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(37)] + ["<unk>"]
    asr = tables.model_classes["Paraformer"](
        input_size=560, vocab_size=41,
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=64, num_blocks=2),
        decoder_conf=dict(attention_heads=4, linear_units=64, num_blocks=2,
                          att_layer_num=2, sanm_shfit=0),
        predictor_conf=dict(idim=32), sos=1, eos=2, predictor_bias=1)
    export_ftr(asr, asr.init_params(jax.random.PRNGKey(0)),
               str(model_dir / "weights.ftr"),
               extra_meta={"lfr_m": 7, "lfr_n": 6, "n_mels": 80})
    (model_dir / "tokens.txt").write_text("\n".join(tokens) + "\n")
    vad = FsmnVADStreaming(
        encoder="FSMN",
        encoder_conf=dict(input_dim=400, input_affine_dim=32, fsmn_layers=1,
                          linear_dim=32, proj_dim=16, lorder=5, rorder=0,
                          lstride=1, rstride=1, output_affine_dim=32,
                          output_dim=4))
    export_vad_ftr(vad, vad.init_params(jax.random.PRNGKey(1)),
                   str(model_dir / "vad.ftr"))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [str(built / "funasr-tpu-wss-server"), "--port", str(port),
         "--model-dir", str(model_dir), "--decoder-thread-num", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 10
        while time.time() < deadline:
            try:
                socket.create_connection(("127.0.0.1", port), 0.2).close()
                break
            except OSError:
                time.sleep(0.1)

        async def run_2pass():
            ws = await connect("127.0.0.1", port)
            await ws.send(jsonlib.dumps(
                {"mode": "2pass", "wav_name": "t", "is_speaking": True}))
            rng_l = np.random.default_rng(0)
            pcm = (np.clip(rng_l.standard_normal(16000 * 2) * 0.2, -1, 1)
                   * 32767).astype("<i2").tobytes()
            for off in range(0, len(pcm), 19200):  # 600ms chunks
                await ws.send(pcm[off:off + 19200])
            await ws.send(jsonlib.dumps({"is_speaking": False}))
            msgs = []
            while True:
                m = jsonlib.loads(await asyncio.wait_for(ws.recv(), 60))
                msgs.append(m)
                if m.get("is_final"):
                    break
            await ws.close()
            return msgs

        msgs = asyncio.run(run_2pass())
        assert msgs[-1]["is_final"] and msgs[-1]["mode"] in ("2pass-offline",
                                                             "offline")
        assert any(m["mode"] == "2pass-online" for m in msgs[:-1]), msgs
        assert any(m["text"] for m in msgs), msgs  # engine produced text

        async def run_offline():
            ws = await connect("127.0.0.1", port)
            await ws.send(jsonlib.dumps(
                {"mode": "offline", "wav_name": "o", "is_speaking": True}))
            rng_l = np.random.default_rng(1)
            pcm = (np.clip(rng_l.standard_normal(16000) * 0.2, -1, 1)
                   * 32767).astype("<i2").tobytes()
            await ws.send(pcm)
            await ws.send(jsonlib.dumps({"is_speaking": False}))
            m = jsonlib.loads(await asyncio.wait_for(ws.recv(), 60))
            await ws.close()
            return m

        m = asyncio.run(run_offline())
        assert m["is_final"] and m["mode"] == "offline" and m["wav_name"] == "o"

        async def run_offline_hotword():
            # reference 2pass protocol extras: hotwords as a JSON-object
            # string + per-session itn flag — must bias/normalize, not crash
            ws = await connect("127.0.0.1", port)
            await ws.send(jsonlib.dumps(
                {"mode": "offline", "wav_name": "h", "is_speaking": True,
                 "hotwords": jsonlib.dumps({"一二三": 10}), "itn": True}))
            rng_l = np.random.default_rng(1)
            pcm = (np.clip(rng_l.standard_normal(16000) * 0.2, -1, 1)
                   * 32767).astype("<i2").tobytes()
            await ws.send(pcm)
            await ws.send(jsonlib.dumps({"is_speaking": False}))
            m2 = jsonlib.loads(await asyncio.wait_for(ws.recv(), 60))
            await ws.close()
            return m2

        m2 = asyncio.run(run_offline_hotword())
        assert m2["is_final"] and m2["wav_name"] == "h"
        assert isinstance(m2["text"], str) and m2["text"], m2
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_native_sensevoice_engine(built, tmp_path, rng):
    """C++ SenseVoice engine: prompt frames + SAN-M/tp encoder + CTC greedy
    match the JAX model's decode on the same features."""
    import wave

    import jax
    import jax.numpy as jnp

    from funasr_tpu.export_runtime import export_sensevoice_ftr
    from funasr_tpu.models.sense_voice.model import SenseVoiceSmall
    from funasr_tpu.ops.fbank import fbank
    from funasr_tpu.ops.lfr import apply_lfr

    tokens = (["<blank>", "<s>", "</s>"]
              + [chr(ord("一") + i) for i in range(30)]
              + ["<|zh|>", "<|en|>", "<|HAPPY|>", "<|Speech|>", "<|withitn|>"])
    model = SenseVoiceSmall(
        input_size=560, vocab_size=len(tokens), blank_id=0,
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=48,
                          num_blocks=2, tp_blocks=1, kernel_size=7))
    params = model.init_params(jax.random.PRNGKey(21))

    model_dir = tmp_path / "svmodel"
    model_dir.mkdir()
    export_sensevoice_ftr(model, params, str(model_dir / "weights.ftr"),
                          extra_meta={"lfr_m": 7, "lfr_n": 6, "n_mels": 80})
    (model_dir / "tokens.txt").write_text("\n".join(tokens) + "\n")

    wav_f = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    pcm = (np.clip(wav_f, -1, 1) * 32767).astype(np.int16)
    wav_path = str(tmp_path / "sv.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    # python-side decode on the same PCM16 waveform (no CMVN in the dir)
    wav_q = pcm.astype(np.float32) / 32768.0
    mel = np.asarray(fbank(jnp.asarray(wav_q * 32768.0)))
    feats = np.asarray(apply_lfr(jnp.asarray(mel), 7, 6))[None]
    lens = np.asarray([feats.shape[1]], np.int32)
    yseq, out_lens, _ = model.infer_jit(
        params, jnp.asarray(feats), jnp.asarray(lens),
        jnp.asarray([0], jnp.int32), jnp.asarray([15], jnp.int32))  # auto, woitn
    ids = np.asarray(yseq)[0, : int(np.asarray(out_lens)[0])]
    keep = np.concatenate([[True], ids[1:] != ids[:-1]])
    token_int = [int(t) for t in ids[keep] if t != 0]
    # mirror of Vocab::Decode for a zh/tag-only vocab: skip blank/sos/eos
    expected = "".join(tokens[t] for t in token_int if t not in (1, 2))

    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRInit.restype = ctypes.c_void_p
    lib.FunASRInit.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.FunOfflineInfer.restype = ctypes.c_void_p
    lib.FunOfflineInfer.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.FunASRGetResult.restype = ctypes.c_char_p
    lib.FunASRGetResult.argtypes = [ctypes.c_void_p, ctypes.c_int]

    h = lib.FunASRInit(str(model_dir).encode(), 1)
    data = open(wav_path, "rb").read()
    res = lib.FunOfflineInfer(h, data, len(data), 0, 16000)
    assert res, "FunOfflineInfer returned null"
    out_cpp = lib.FunASRGetResult(res, 0).decode()
    assert out_cpp == expected, (out_cpp, expected)
    assert expected  # random weights still emit some tokens


def test_native_punc_streaming(built, tmp_path):
    """C++ streaming punc (ct-transformer-online role): per-chunk outputs with
    a carried cache byte-match the JAX CTTransformerStreaming."""
    import types

    import jax

    from funasr_tpu.export_runtime import export_punc_ftr
    from funasr_tpu.models.ct_transformer_streaming.model import (
        CTTransformerStreaming)

    zh = [chr(c) for c in range(ord("一"), ord("一") + 30)]
    token_list = ["<blank>", "<unk>"] + zh
    tok = types.SimpleNamespace(
        token2id={t: i for i, t in enumerate(token_list)}, unk_id=1)

    model = CTTransformerStreaming(
        vocab_size=len(token_list), embed_unit=16, att_unit=32,
        punc_list=["<unk>", "_", "，", "。", "？", "、"],
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=48,
                          num_blocks=3, kernel_size=7, input_size=16))
    params = model.init_params(jax.random.PRNGKey(13))

    model_dir = tmp_path / "puncstream"
    model_dir.mkdir()
    export_punc_ftr(model, params, str(model_dir / "punc.ftr"),
                    token_list=token_list)

    rng_py = np.random.default_rng(3)
    chunks = [" ".join(str(rng_py.choice(zh)) for _ in range(k))
              for k in (7, 25, 4)]

    cache_py = {}
    out_py = []
    for c in chunks:
        res, _ = model.inference(params, [c], tokenizer=tok, cache=cache_py)
        out_py.append(res[0]["text"])

    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRInit.restype = ctypes.c_void_p
    lib.FunASRInit.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.FunPuncCacheCreate.restype = ctypes.c_void_p
    lib.FunPuncCacheFree.argtypes = [ctypes.c_void_p]
    lib.FunPuncInferOnline.restype = ctypes.c_void_p
    lib.FunPuncInferOnline.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_void_p]
    lib.FunASRGetResult.restype = ctypes.c_char_p
    lib.FunASRGetResult.argtypes = [ctypes.c_void_p, ctypes.c_int]

    h = lib.FunASRInit(str(model_dir).encode(), 1)
    cache = lib.FunPuncCacheCreate()
    out_cpp = []
    for c in chunks:
        res = lib.FunPuncInferOnline(h, c.encode(), ctypes.c_void_p(cache))
        assert res, "FunPuncInferOnline returned null"
        out_cpp.append(lib.FunASRGetResult(res, 0).decode())
    lib.FunPuncCacheFree(ctypes.c_void_p(cache))
    assert out_cpp == out_py, (out_cpp, out_py)
    assert any(out_py)  # something was emitted


def test_native_streaming_engine(built, tmp_path):
    """C++ streaming Paraformer (paraformer-online role): chunk-fed
    FunASRStreamInfer matches the JAX ParaformerStreaming pipeline end to end
    (streaming frontend caches, kv look-back, CIF carry, decoder FSMN caches)."""
    import wave

    import jax

    from funasr_tpu import tables
    from funasr_tpu.export_runtime import export_ftr
    from funasr_tpu.frontends.wav_frontend import WavFrontendOnline
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer

    tokens = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(37)] + ["<unk>"]
    tok = CharTokenizer(token_list=tokens)
    model = tables.model_classes["ParaformerStreaming"](
        input_size=560, vocab_size=41,
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=64,
                          num_blocks=2),
        decoder_conf=dict(attention_heads=4, linear_units=64, num_blocks=2,
                          att_layer_num=2, sanm_shfit=0),
        predictor_conf=dict(idim=32), sos=1, eos=2, predictor_bias=1)
    params = model.init_params(jax.random.PRNGKey(0))
    frontend = WavFrontendOnline(fs=16000, lfr_m=7, lfr_n=6, n_mels=80)

    model_dir = tmp_path / "streammodel"
    model_dir.mkdir()
    export_ftr(model, params, str(model_dir / "weights.ftr"),
               extra_meta={"lfr_m": 7, "lfr_n": 6, "n_mels": 80,
                           "chunk_pad_left": 0, "chunk_stride": 10,
                           "chunk_lookahead": 5,
                           "encoder_chunk_look_back": 4,
                           "decoder_chunk_look_back": 1})
    (model_dir / "tokens.txt").write_text("\n".join(tokens) + "\n")

    rng_l = np.random.default_rng(5)
    pcm = (np.clip(rng_l.standard_normal(16000 * 2) * 0.2, -1, 1)
           * 32767).astype("<i2")
    wav_f = pcm.astype(np.float32) / 32768.0
    # uneven chunk sizes exercise the prev_samples carry
    bounds = [0, 9600, 12000, 25600, len(pcm)]
    chunks = [(pcm[a:b], wav_f[a:b]) for a, b in zip(bounds, bounds[1:])]

    cache = {}
    py_text = ""
    for ci, (_, fchunk) in enumerate(chunks):
        res, _ = model.inference(
            params, [fchunk], tokenizer=tok, frontend=frontend, cache=cache,
            is_final=ci == len(chunks) - 1, chunk_size=[0, 10, 5],
            encoder_chunk_look_back=4, decoder_chunk_look_back=1)
        py_text += res[0]["text"]

    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRInit.restype = ctypes.c_void_p
    lib.FunASRInit.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.FunASRStreamCreate.restype = ctypes.c_void_p
    lib.FunASRStreamCreate.argtypes = [ctypes.c_void_p]
    lib.FunASRStreamInfer.restype = ctypes.c_void_p
    lib.FunASRStreamInfer.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.FunASRGetResult.restype = ctypes.c_char_p
    lib.FunASRGetResult.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.FunASRStreamFree.argtypes = [ctypes.c_void_p]

    h = lib.FunASRInit(str(model_dir).encode(), 1)
    stream = lib.FunASRStreamCreate(h)
    assert stream, "stream creation failed"
    cpp_text = ""
    for ci, (pchunk, _) in enumerate(chunks):
        data = pchunk.tobytes()
        res = lib.FunASRStreamInfer(stream, data, len(data),
                                    1 if ci == len(chunks) - 1 else 0, 16000)
        assert res, "FunASRStreamInfer returned null"
        cpp_text += lib.FunASRGetResult(res, 0).decode()
    lib.FunASRStreamFree(ctypes.c_void_p(stream))

    assert cpp_text.replace(" ", "") == py_text.replace(" ", ""), \
        (cpp_text, py_text)
    assert py_text.strip(), "python streaming produced no text"


def test_itn_grammar_archive_cpp(built, tmp_path):
    """The C++ grammar-archive interpreter (FunItnGrammarLoad/Apply, the
    FAR-consumer role) byte-matches python load_grammar on cardinal ITN
    across the word-lexicon and CJK languages."""
    from funasr_tpu.text.export_grammar import export_grammar, load_grammar

    archive_path = str(tmp_path / "grammar.json")
    export_grammar(archive_path)
    py_funcs = load_grammar(archive_path)

    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunItnGrammarLoad.restype = ctypes.c_void_p
    lib.FunItnGrammarLoad.argtypes = [ctypes.c_char_p]
    lib.FunItnGrammarApply.restype = ctypes.c_void_p
    lib.FunItnGrammarApply.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_char_p]
    lib.FunASRGetResult.restype = ctypes.c_char_p
    lib.FunASRGetResult.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.FunItnGrammarFree.argtypes = [ctypes.c_void_p]

    g = lib.FunItnGrammarLoad(archive_path.encode())
    assert g, "grammar archive failed to load in C++"

    cases = {
        "de": ["dreihundertfünfundzwanzig euro", "null sieben eins drei",
               "eine million zweihunderttausend", "hallo welt"],
        "es": ["doscientos treinta y cuatro", "mil novecientos ochenta"],
        "fr": ["deux cents", "trois mille quatre"],
        "pt": ["quinhentos e vinte e um", "dois mil"],
        "ru": ["двести тридцать четыре", "пять тысяч сто"],
        "id": ["tujuhbelas", "dua ratus lima puluh"],
        "vi": ["hai trăm lẻ năm", "ba mươi bảy"],
        "tl": ["dalawampu at lima", "isang daan"],
        "ja": ["三千二百十一", "一億二千万", "テスト三十五です"],
        "ko": ["삼만 오천", "구백구십구"],
        "zh": ["三百二十一", "五万六千"],
    }
    from funasr_tpu.text.inverse_normalize import InverseNormalizer
    del py_funcs  # Apply() includes class rules; golden is the full pipeline
    for lang, texts in cases.items():
        for text in texts:
            res = lib.FunItnGrammarApply(g, lang.encode(), text.encode())
            assert res, (lang, text)
            cpp_out = lib.FunASRGetResult(res, 0).decode()
            py_out = InverseNormalizer(lang=lang).inverse_normalize(text)
            assert cpp_out == py_out, (lang, text, cpp_out, py_out)

    # class rules (decimals/money/percent/ordinals) byte-match the python
    # InverseNormalizer (times stay host-side by design)
    class_cases = [
        ("de", "drei komma eins vier"), ("de", "fünf euro zwanzig"),
        ("de", "fünfzig prozent"),
        ("es", "cinco euros con veinte céntimos"), ("es", "tercero"),
        ("es", "cincuenta por ciento"),
        ("fr", "cinq euros vingt"), ("fr", "cinquante pour cent"),
        ("pt", "primeiro"), ("pt", "cinquenta por cento"),
        ("ru", "пять рублей"), ("ru", "третий"),
        ("ru", "пятьдесят процентов"),
        ("id", "lima puluh persen"), ("vi", "năm mươi phần trăm"),
        ("ja", "三点一四"), ("ja", "五十パーセント"),
        ("ko", "삼점일사"), ("ko", "오십퍼센트"),
        ("de", "dreihundertfünfundzwanzig euro"),
        ("ja", "三千二百十一"), ("ko", "삼만 오천"),
        # v5 class rules: fractions / measures / telephone
        ("de", "drei fünftel"), ("de", "fünf kilometer"),
        ("de", "zwei komma fünf kilogramm"),
        ("es", "cinco kilómetros"), ("fr", "deux tiers"),
        ("fr", "cinq kilomètres"), ("pt", "dois terços"),
        ("ru", "пять километров"), ("ru", "сто граммов"),
        ("id", "tiga per empat"), ("id", "lima kilometer"),
        ("vi", "ba phần tư"), ("vi", "năm ki-lô-mét"),
        ("ja", "三分の一"), ("ja", "五キロメートル"),
        ("ja", "ゼロ三の一二三四の五六七八"),
        ("ko", "삼분의 일"), ("ko", "오 킬로미터"), ("ko", "오미터"),
        # v6 class rules: electronic (email/url) + whitelist
        ("de", "meine adresse ist hans at gmail punkt de"),
        ("de", "doktor schmidt hat fünfzig prozent"),
        ("es", "c d f uno arroba a b c punto e d u"),
        ("fr", "monsieur dupont arobase orange point fr"),
        ("fr", "www a b c point com"), ("fr", "www point le monde point fr"),
        ("ru", "то есть пять рублей"),
        ("ja", "abcアットマークdefドットcom"), ("ja", "セブンイレブンで三点一四"),
        ("ko", "abc골뱅이def닷com"),
        ("vi", "a b c a còng d e f chấm com"),
        ("id", "user at gmail titik com dot"),
        ("pt", "senhor silva arroba uol ponto com ponto br"),
        # r5 class rules: vi time-to/half + money tsv depth, vi year guard,
        # tl teens/ordinals/money, id teens/months/ordinals
        ("vi", "chín giờ kém hai mươi"), ("vi", "hai giờ rưỡi"),
        ("vi", "mười hai đô la mỹ"),
        ("vi", "ngày hai mươi tháng tư năm hai nghìn không trăm hai mươi"),
        ("tl", "labinlima"), ("tl", "tatlo libo labintatlo"),
        ("tl", "dalawampu't lima"),
        ("tl", "ikalimang hakbang"), ("tl", "lima piso"),
        ("tl", "sampu porsyento"), ("tl", "lima kilometro"),
        ("id", "dua ribu tiga belas"), ("id", "kelima"), ("id", "pertama"),
        ("id", "dua puluh empat januari dua ribu tiga belas"),
        ("id", "jam setengah lima"),
    ]
    for lang, text in class_cases:
        res = lib.FunItnGrammarApply(g, lang.encode(), text.encode())
        cpp_out = lib.FunASRGetResult(res, 0).decode()
        py_out = InverseNormalizer(lang=lang).inverse_normalize(text)
        assert cpp_out == py_out, (lang, text, cpp_out, py_out)
    lib.FunItnGrammarFree(ctypes.c_void_p(g))


def test_native_sensevoice_int8(built, tmp_path, rng):
    """int8 SenseVoice export keeps the query-embedding table fp32 (it is
    row-gathered, not matmul'd) and still transcribes through the C API."""
    import wave

    import jax

    from funasr_tpu.export_runtime import export_sensevoice_ftr
    from funasr_tpu.models.sense_voice.model import SenseVoiceSmall

    tokens = (["<blank>", "<s>", "</s>"]
              + [chr(ord("一") + i) for i in range(30)] + ["<|zh|>"])
    model = SenseVoiceSmall(
        input_size=560, vocab_size=len(tokens), blank_id=0,
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=48,
                          num_blocks=2, tp_blocks=1, kernel_size=7))
    params = model.init_params(jax.random.PRNGKey(8))
    model_dir = tmp_path / "svq"
    model_dir.mkdir()
    export_sensevoice_ftr(model, params, str(model_dir / "weights.ftr"),
                          quant="int8",
                          extra_meta={"lfr_m": 7, "lfr_n": 6, "n_mels": 80})
    (model_dir / "tokens.txt").write_text("\n".join(tokens) + "\n")

    pcm = (np.clip(rng.standard_normal(16000) * 0.1, -1, 1)
           * 32767).astype(np.int16)
    wav_path = str(tmp_path / "q.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRInit.restype = ctypes.c_void_p
    lib.FunASRInit.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.FunOfflineInfer.restype = ctypes.c_void_p
    lib.FunOfflineInfer.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.FunASRGetResult.restype = ctypes.c_char_p
    lib.FunASRGetResult.argtypes = [ctypes.c_void_p, ctypes.c_int]
    h = lib.FunASRInit(str(model_dir).encode(), 1)
    data = open(wav_path, "rb").read()
    res = lib.FunOfflineInfer(h, data, len(data), 0, 16000)
    assert res, "int8 SenseVoice failed to load/infer"
    out = lib.FunASRGetResult(res, 0)
    assert out is not None  # decode path ran (text may be short on random w)


def test_native_streaming_edge_cases(built, tmp_path):
    """Streaming engine robustness: int8 weights, sub-stride feeds, and
    session reuse after is_final (the reset path)."""
    import jax

    from funasr_tpu import tables
    from funasr_tpu.export_runtime import export_ftr

    tokens = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(37)] + ["<unk>"]
    model = tables.model_classes["ParaformerStreaming"](
        input_size=560, vocab_size=41,
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=64,
                          num_blocks=2),
        decoder_conf=dict(attention_heads=4, linear_units=64, num_blocks=2,
                          att_layer_num=2, sanm_shfit=0),
        predictor_conf=dict(idim=32), sos=1, eos=2, predictor_bias=1)
    params = model.init_params(jax.random.PRNGKey(1))
    model_dir = tmp_path / "sq"
    model_dir.mkdir()
    export_ftr(model, params, str(model_dir / "weights.ftr"), quant="int8",
               extra_meta={"lfr_m": 7, "lfr_n": 6, "n_mels": 80,
                           "encoder_chunk_look_back": 4,
                           "decoder_chunk_look_back": 1})
    (model_dir / "tokens.txt").write_text("\n".join(tokens) + "\n")

    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRInit.restype = ctypes.c_void_p
    lib.FunASRInit.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.FunASRStreamCreate.restype = ctypes.c_void_p
    lib.FunASRStreamCreate.argtypes = [ctypes.c_void_p]
    lib.FunASRStreamInfer.restype = ctypes.c_void_p
    lib.FunASRStreamInfer.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.FunASRGetResult.restype = ctypes.c_char_p
    lib.FunASRGetResult.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.FunASRStreamFree.argtypes = [ctypes.c_void_p]

    h = lib.FunASRInit(str(model_dir).encode(), 1)
    stream = lib.FunASRStreamCreate(h)
    assert stream
    # 2pass memory guarantee: offline + streaming engines share ONE weights
    # arena (a single FtrFile loaded in FunASRInit), not two copies
    lib.FunASRSharedWeights.restype = ctypes.c_int
    lib.FunASRSharedWeights.argtypes = [ctypes.c_void_p]
    assert lib.FunASRSharedWeights(h) == 1

    rng_l = np.random.default_rng(7)

    def run_utterance(seed):
        rng_u = np.random.default_rng(seed)
        pcm = (np.clip(rng_u.standard_normal(16000) * 0.2, -1, 1)
               * 32767).astype("<i2").tobytes()
        text = ""
        # tiny 100 ms feeds — far below one stride — then the final flush
        step = 3200
        for off in range(0, len(pcm), step):
            is_final = off + step >= len(pcm)
            res = lib.FunASRStreamInfer(stream, pcm[off:off + step],
                                        min(step, len(pcm) - off), is_final,
                                        16000)
            assert res
            text += lib.FunASRGetResult(res, 0).decode()
        return text

    t1 = run_utterance(1)
    t2 = run_utterance(2)  # same stream reused after is_final reset
    t1_again = run_utterance(1)
    assert t1, "no text decoded"
    assert t1 == t1_again, "session reset is not clean (state leaked)"
    lib.FunASRStreamFree(ctypes.c_void_p(stream))


def test_runtime_bins_surface(built, tmp_path):
    """funasr_onnx-style python bindings (funasr_tpu.runtime_bins) drive the
    native engines: offline ASR, streaming ASR, VAD, offline+streaming punc."""
    import os as _os
    import wave

    import jax

    from funasr_tpu import tables
    from funasr_tpu.export_runtime import (export_ftr, export_punc_ftr,
                                           export_vad_ftr)
    from funasr_tpu.models.ct_transformer.model import CTTransformer
    from funasr_tpu.models.fsmn_vad_streaming.model import FsmnVADStreaming

    _os.environ["FUNASR_TPU_RUNTIME_LIB"] = str(
        built / "libfunasr_tpu_runtime.so")
    from funasr_tpu import runtime_bins

    tokens = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(37)] + ["<unk>"]
    asr = tables.model_classes["ParaformerStreaming"](
        input_size=560, vocab_size=41,
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=64,
                          num_blocks=2),
        decoder_conf=dict(attention_heads=4, linear_units=64, num_blocks=2,
                          att_layer_num=2, sanm_shfit=0),
        predictor_conf=dict(idim=32), sos=1, eos=2, predictor_bias=1)
    model_dir = tmp_path / "bins"
    model_dir.mkdir()
    export_ftr(asr, asr.init_params(jax.random.PRNGKey(0)),
               str(model_dir / "weights.ftr"),
               extra_meta={"lfr_m": 7, "lfr_n": 6, "n_mels": 80})
    (model_dir / "tokens.txt").write_text("\n".join(tokens) + "\n")
    vad = FsmnVADStreaming(
        encoder="FSMN",
        encoder_conf=dict(input_dim=400, input_affine_dim=32, fsmn_layers=1,
                          linear_dim=32, proj_dim=16, lorder=5, rorder=0,
                          lstride=1, rstride=1, output_affine_dim=32,
                          output_dim=4))
    export_vad_ftr(vad, vad.init_params(jax.random.PRNGKey(1)),
                   str(model_dir / "vad.ftr"))
    punc_tokens = ["<blank>", "<unk>"] + [chr(ord("一") + i) for i in range(37)]
    pm = CTTransformer(
        vocab_size=len(punc_tokens), embed_unit=16, att_unit=32,
        punc_list=["<unk>", "_", "，", "。", "？", "、"],
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=48,
                          num_blocks=2, kernel_size=7, input_size=16))
    export_punc_ftr(pm, pm.init_params(jax.random.PRNGKey(2)),
                    str(model_dir / "punc.ftr"), token_list=punc_tokens)

    rng_l = np.random.default_rng(4)
    pcm = (np.clip(rng_l.standard_normal(16000) * 0.2, -1, 1)
           * 32767).astype(np.int16)
    wav_path = str(tmp_path / "b.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    out = runtime_bins.Paraformer(str(model_dir))([wav_path])
    assert out and "preds" in out[0]

    online = runtime_bins.ParaformerOnline(str(model_dir))
    t = online(pcm.tobytes(), is_final=True)[0]["preds"]
    assert isinstance(t, str)

    segs = runtime_bins.Fsmn_vad(str(model_dir))(wav_path)
    assert isinstance(segs[0], list)

    vad_online = runtime_bins.Fsmn_vad_online(str(model_dir))
    ev = vad_online(pcm.tobytes(), is_final=True)
    assert isinstance(ev, list)

    text = "".join(str(rng_l.choice([chr(ord("一") + i) for i in range(37)]))
                   for _ in range(8))
    punct, _ = runtime_bins.CT_Transformer(str(model_dir))(text)
    assert punct

    stream_punc = runtime_bins.CT_Transformer_VadRealtime(str(model_dir))
    p1, _ = stream_punc(text)
    p2, _ = stream_punc(text)
    assert isinstance(p1, str) and isinstance(p2, str)


def test_native_bicif_timestamps(built, tmp_path, rng):
    """C++ BiCif timestamps (FunASRGetStamp): upsample-head alphas + the
    ts_prediction_lfr6_standard port produce the same per-token [start_ms,
    end_ms] pairs as the python pipeline on the same features."""
    import json as jsonlib
    import wave

    import jax
    import jax.numpy as jnp

    from funasr_tpu import tables
    from funasr_tpu.export_runtime import export_ftr
    from funasr_tpu.ops.fbank import fbank
    from funasr_tpu.ops.lfr import apply_lfr
    from funasr_tpu.utils.timestamp_tools import ts_prediction_lfr6_standard

    tokens = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(37)] + ["<unk>"]
    model = tables.model_classes["BiCifParaformer"](
        input_size=560, vocab_size=41,
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=64,
                          num_blocks=2),
        decoder_conf=dict(attention_heads=4, linear_units=64, num_blocks=2,
                          att_layer_num=2, sanm_shfit=0),
        predictor_conf=dict(idim=32, upsample_times=3,
                            upsample_type="cnn_blstm"),
        sos=1, eos=2, predictor_bias=1)
    params = model.init_params(jax.random.PRNGKey(0))
    model_dir = tmp_path / "bicif"
    model_dir.mkdir()
    export_ftr(model, params, str(model_dir / "weights.ftr"),
               extra_meta={"lfr_m": 7, "lfr_n": 6, "n_mels": 80})
    (model_dir / "tokens.txt").write_text("\n".join(tokens) + "\n")

    pcm = (np.clip(rng.standard_normal(32000) * 0.2, -1, 1)
           * 32767).astype(np.int16)
    wav_path = str(tmp_path / "ts.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    # python expected stamps on the exact same features
    wav_q = pcm.astype(np.float32) / 32768.0
    mel = np.asarray(fbank(jnp.asarray(wav_q * 32768.0)))
    feats = np.asarray(apply_lfr(jnp.asarray(mel), 7, 6))[None]
    lens = np.asarray([feats.shape[1]], np.int32)
    yseq, tok_lens, _, us_alphas, us_peaks, enc_lens = \
        model.infer_jit_timestamp(params, jnp.asarray(feats),
                                  jnp.asarray(lens))
    ids = [int(t) for t in np.asarray(yseq)[0, : int(np.asarray(tok_lens)[0])]
           if t not in (0, 1, 2)]
    char_list = [tokens[t] for t in ids]
    up = model.predictor.upsample_times
    n_us = int(np.asarray(enc_lens)[0]) * up
    _, ts = ts_prediction_lfr6_standard(
        np.asarray(us_alphas)[0, :n_us], np.asarray(us_peaks)[0, :n_us],
        list(char_list), upsample_rate=up)
    expected = ts  # already per-token [start_ms, end_ms], sils excluded

    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRInit.restype = ctypes.c_void_p
    lib.FunASRInit.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.FunOfflineInfer.restype = ctypes.c_void_p
    lib.FunOfflineInfer.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.FunASRGetStamp.restype = ctypes.c_char_p
    lib.FunASRGetStamp.argtypes = [ctypes.c_void_p]
    lib.FunASRGetResult.restype = ctypes.c_char_p
    lib.FunASRGetResult.argtypes = [ctypes.c_void_p, ctypes.c_int]

    h = lib.FunASRInit(str(model_dir).encode(), 1)
    data = open(wav_path, "rb").read()
    res = lib.FunOfflineInfer(h, data, len(data), 0, 16000)
    assert res
    stamp = lib.FunASRGetStamp(res).decode()
    assert stamp, "no timestamps returned"
    got = jsonlib.loads(stamp)
    assert len(got) == len(expected), (got, expected)
    for (gs, ge), (es, ee) in zip(got, expected):
        assert abs(gs - es) <= 21 and abs(ge - ee) <= 21, (got, expected)


def test_native_seaco_export_runs(built, tmp_path, rng):
    """A SeacoParaformer export (the paraformer-zh default class: BiCif +
    hotword bias heads) loads in the C++ engine and produces the same
    transcript as the JAX no-hotword path, with timestamps."""
    import wave

    import jax
    import jax.numpy as jnp

    from funasr_tpu import tables
    from funasr_tpu.export_runtime import export_ftr
    from funasr_tpu.ops.fbank import fbank
    from funasr_tpu.ops.lfr import apply_lfr

    tokens = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(36)] + ["<unk>", "<NO_BIAS>"]
    model = tables.model_classes["SeacoParaformer"](
        input_size=560, vocab_size=42,
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=64,
                          num_blocks=2),
        decoder_conf=dict(attention_heads=4, linear_units=64, num_blocks=2,
                          att_layer_num=2, sanm_shfit=0),
        predictor="CifPredictorV3",
        predictor_conf=dict(idim=32, upsample_times=3, upsample_type="cnn"),
        seaco_decoder_conf=dict(attention_heads=4, linear_units=64,
                                num_blocks=1, att_layer_num=1,
                                use_output_layer=False, wo_input_layer=True),
        inner_dim=32, sos=1, eos=2, predictor_bias=1, NO_BIAS=41)
    params = model.init_params(jax.random.PRNGKey(0))
    model_dir = tmp_path / "seaco"
    model_dir.mkdir()
    export_ftr(model, params, str(model_dir / "weights.ftr"),
               extra_meta={"lfr_m": 7, "lfr_n": 6, "n_mels": 80})
    (model_dir / "tokens.txt").write_text("\n".join(tokens) + "\n")

    pcm = (np.clip(rng.standard_normal(24000) * 0.2, -1, 1)
           * 32767).astype(np.int16)
    wav_path = str(tmp_path / "sc.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    # python no-hotword decode on the same features
    wav_q = pcm.astype(np.float32) / 32768.0
    mel = np.asarray(fbank(jnp.asarray(wav_q * 32768.0)))
    feats = np.asarray(apply_lfr(jnp.asarray(mel), 7, 6))[None]
    lens = np.asarray([feats.shape[1]], np.int32)
    yseq, tok_lens, _, _, _ = model.infer_jit(params, jnp.asarray(feats),
                                              jnp.asarray(lens))
    ids = [int(t) for t in np.asarray(yseq)[0, : int(np.asarray(tok_lens)[0])]
           if t not in (0, 1, 2)]
    expected = "".join(tokens[t] for t in ids if tokens[t] != "<unk>")

    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRInit.restype = ctypes.c_void_p
    lib.FunASRInit.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.FunOfflineInfer.restype = ctypes.c_void_p
    lib.FunOfflineInfer.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.FunASRGetResult.restype = ctypes.c_char_p
    lib.FunASRGetResult.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.FunASRGetStamp.restype = ctypes.c_char_p
    lib.FunASRGetStamp.argtypes = [ctypes.c_void_p]
    h = lib.FunASRInit(str(model_dir).encode(), 1)
    data = open(wav_path, "rb").read()
    res = lib.FunOfflineInfer(h, data, len(data), 0, 16000)
    assert res
    got = lib.FunASRGetResult(res, 0).decode()
    assert got.replace(" ", "") == expected.replace(" ", ""), (got, expected)
    assert lib.FunASRGetStamp(res).decode(), "no timestamps from seaco export"


def test_native_vad_streaming(built, tmp_path, rng):
    """Streaming VAD C API (fsmn-vad-online role): incremental [beg,-1] /
    [-1,end] events over chunked audio, consistent with the whole-buffer
    segmentation."""
    import json as jsonlib

    import jax

    from funasr_tpu.export_runtime import export_vad_ftr
    from funasr_tpu.models.fsmn_vad_streaming.model import FsmnVADStreaming

    model = FsmnVADStreaming(
        encoder="FSMN",
        encoder_conf=dict(input_dim=400, input_affine_dim=64, fsmn_layers=2,
                          linear_dim=64, proj_dim=32, lorder=10, rorder=0,
                          lstride=1, rstride=1, output_affine_dim=64,
                          output_dim=8))
    params = model.init_params(jax.random.PRNGKey(3))
    model_dir = tmp_path / "vadstream"
    model_dir.mkdir()
    export_vad_ftr(model, params, str(model_dir / "vad.ftr"))

    pcm = (np.clip(rng.standard_normal(16000 * 2) * 0.1, -1, 1)
           * 32767).astype("<i2").tobytes()

    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRInit.restype = ctypes.c_void_p
    lib.FunASRInit.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.FunVadStreamCreate.restype = ctypes.c_void_p
    lib.FunVadStreamCreate.argtypes = [ctypes.c_void_p]
    lib.FunVadStreamInfer.restype = ctypes.c_void_p
    lib.FunVadStreamInfer.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.FunASRGetResult.restype = ctypes.c_char_p
    lib.FunASRGetResult.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.FunVadStreamFree.argtypes = [ctypes.c_void_p]

    h = lib.FunASRInit(str(model_dir).encode(), 1)
    stream = lib.FunVadStreamCreate(h)
    assert stream, "vad stream creation failed"
    events = []
    step = 6400  # 200 ms chunks
    for off in range(0, len(pcm), step):
        is_final = off + step >= len(pcm)
        res = lib.FunVadStreamInfer(stream, pcm[off:off + step],
                                    min(step, len(pcm) - off), is_final, 16000)
        assert res
        events.extend(jsonlib.loads(lib.FunASRGetResult(res, 0).decode()))
    lib.FunVadStreamFree(ctypes.c_void_p(stream))

    # protocol shape: opens [beg,-1] and closes [-1,end] strictly alternate,
    # ending closed
    state_open = False
    for beg, end in events:
        if beg >= 0 and end == -1:
            assert not state_open, events
            state_open = True
        elif beg == -1 and end >= 0:
            assert state_open, events
            state_open = False
        else:
            raise AssertionError(f"malformed event {beg},{end}")
    assert not state_open, events
    assert events, "no VAD events emitted on speech-shaped noise"


def _parse_ftr_records(path):
    """Walk the FTR container -> [(name, dtype, dims, payload_bytes)] + header."""
    import struct

    with open(path, "rb") as f:
        assert f.read(4) == b"FTR1"
        (meta_len,) = struct.unpack("<I", f.read(4))
        meta = f.read(meta_len)
        (n,) = struct.unpack("<I", f.read(4))
        records = []
        for _ in range(n):
            (nl,) = struct.unpack("<I", f.read(4))
            name = f.read(nl).decode()
            dtype, ndim = struct.unpack("<BB", f.read(2))
            dims = struct.unpack(f"<{ndim}q", f.read(8 * ndim))
            numel = int(np.prod(dims)) if ndim else 1
            if dtype == 1:
                (ns,) = struct.unpack("<q", f.read(8))
                payload = struct.pack("<q", ns) + f.read(4 * ns) + f.read(numel)
            else:
                payload = f.read(4 * numel)
            records.append((name, dtype, dims, payload))
    return meta, records


def test_int8_export_keeps_depthwise_conv_f32(tiny_model_dir, tmp_path,
                                              monkeypatch):
    """Production-size depthwise FSMN kernels (e.g. 11x512, above the quant
    threshold) must never be int8-quantized: every C++ engine consumes
    fsmn_block/w raw via WTensor::f32 (sanm-encoder.cc:50), which is an empty
    vector for quantized tensors -> garbage transcripts. Regression for the
    round-2 advisor's high-severity finding."""
    import funasr_tpu.export_runtime as er
    from funasr_tpu.auto.auto_model import AutoModel

    am = AutoModel(model=tiny_model_dir, disable_pbar=True)
    # tiny dims are below the real threshold; force everything quantizable
    monkeypatch.setattr(er, "_QUANT_MIN_SIZE", 1)
    path = str(tmp_path / "weights.ftr")
    er.export_ftr(am.model, am.model_params, path, quant="int8")
    _, records = _parse_ftr_records(path)
    dtypes = {name: dtype for name, dtype, _, _ in records}
    fsmn = {k: v for k, v in dtypes.items() if k.endswith("fsmn_block/w")}
    assert fsmn and all(v == 0 for v in fsmn.values()), fsmn
    mats = {k: v for k, v in dtypes.items() if k.endswith("linear_q_k_v/w")}
    assert mats and all(v == 1 for v in mats.values()), mats


def test_legacy_quantized_fsmn_dequantized_at_load(built, tiny_model_dir,
                                                   tmp_path, monkeypatch):
    """Old int8 exports DID quantize fsmn_block/w; FtrFile::Load must
    dequantize those records so legacy files still transcribe (matching a
    Python model whose fsmn weights go through the same quant round-trip)."""
    import struct
    import wave

    import funasr_tpu.export_runtime as er
    from funasr_tpu.auto.auto_model import AutoModel

    am = AutoModel(model=tiny_model_dir, disable_pbar=True)
    out_dir = tmp_path / "legacy_native"
    out_dir.mkdir()
    er.export_native_dir(am.model, am.model_params, tiny_model_dir,
                         str(out_dir))
    path = str(out_dir / "weights.ftr")
    meta, records = _parse_ftr_records(path)

    def quant_cols(arr):
        scales = np.maximum(np.abs(arr).max(axis=0), 1e-12) / 127.0
        q = np.clip(np.round(arr / scales[None, :]), -127, 127).astype(np.int8)
        return q, scales.astype(np.float32)

    with open(path, "wb") as f:
        f.write(b"FTR1")
        f.write(struct.pack("<I", len(meta)))
        f.write(meta)
        f.write(struct.pack("<I", len(records)))
        for name, dtype, dims, payload in records:
            nb = name.encode()
            f.write(struct.pack("<I", len(nb)))
            f.write(nb)
            if name.endswith("fsmn_block/w"):
                arr = np.frombuffer(payload, "<f4").reshape(dims)
                q, scales = quant_cols(arr)
                f.write(struct.pack("<BB", 1, len(dims)))
                f.write(np.asarray(dims, "<i8").tobytes())
                f.write(struct.pack("<q", scales.size))
                f.write(scales.tobytes())
                f.write(q.tobytes())
            else:
                f.write(struct.pack("<BB", dtype, len(dims)))
                f.write(np.asarray(dims, "<i8").tobytes())
                f.write(payload)

    rng = np.random.default_rng(9)
    sig = (rng.standard_normal(24000) * 0.1 * 32767).astype(np.int16)
    wav_path = str(tmp_path / "legacy.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.tobytes())

    # python twin: same quant round-trip applied to the fsmn kernels
    import jax

    def roundtrip(path_leaf):
        def fn(p, leaf):
            keys = [getattr(k, "key", getattr(k, "idx", None)) for k in p]
            if "fsmn_block" in keys and keys[-1] == "w":
                arr = np.asarray(leaf)
                flat = arr.reshape(-1, arr.shape[-1])
                q, scales = quant_cols(flat)
                return (q.astype(np.float32) * scales[None, :]).reshape(
                    arr.shape).astype(arr.dtype)
            return leaf
        return fn

    am.model_params = jax.tree_util.tree_map_with_path(
        roundtrip(None), am.model_params)
    py_text = am.generate(input=wav_path)[0]["text"]

    cli = str(built / "funasr-tpu-offline")
    r = subprocess.run([cli, str(out_dir), wav_path], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    cpp_text = r.stdout.strip().split("\t")[-1]
    assert cpp_text.replace(" ", "") == py_text.replace(" ", ""), \
        (cpp_text, py_text)


def test_cpp_http_server(built, tiny_model_dir, tmp_path):
    """The dependency-free C++ HTTP service (reference runtime/http role):
    `curl -F file=@a.wav :port/recognize` returns the engine transcript."""
    import json as jsonlib
    import socket
    import subprocess as sp
    import time
    import urllib.request
    import wave

    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.export_runtime import export_native_dir

    am = AutoModel(model=tiny_model_dir, disable_pbar=True)
    out_dir = str(tmp_path / "http_native")
    export_native_dir(am.model, am.model_params, tiny_model_dir, out_dir)

    rng = np.random.default_rng(11)
    sig = (rng.standard_normal(16000) * 0.1 * 32767).astype(np.int16)
    wav_path = str(tmp_path / "h.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.tobytes())
    py_text = am.generate(input=wav_path)[0]["text"]

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv = sp.Popen([str(built / "funasr-tpu-http-server"), "--port", str(port),
                    "--model-dir", out_dir], stderr=sp.PIPE)
    try:
        for _ in range(100):
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/health", timeout=2) as r:
                    assert jsonlib.loads(r.read())["status"] == "ok"
                break
            except OSError:
                time.sleep(0.1)
        else:
            raise AssertionError("http server did not come up")

        wav_bytes = open(wav_path, "rb").read()
        boundary = "xyzq"
        body = (f"--{boundary}\r\nContent-Disposition: form-data; "
                f"name=\"file\"; filename=\"h.wav\"\r\n"
                f"Content-Type: audio/wav\r\n\r\n").encode() + wav_bytes + \
            (f"\r\n--{boundary}--\r\n").encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recognize", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = jsonlib.loads(r.read())
        assert out["text"].replace(" ", "") == py_text.replace(" ", ""), \
            (out, py_text)

        # raw-body post (no multipart) also works
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/recognize", data=wav_bytes,
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req2, timeout=60) as r:
            out2 = jsonlib.loads(r.read())
        assert out2["text"] == out["text"]
    finally:
        srv.terminate()
        srv.wait(timeout=10)


def test_itn_timedate_parity_cpp(built, tmp_path):
    """v4 archives carry the declarative time/date rules; the C++ std::regex
    interpreter (ApplyTimedateRules) must byte-match the python pipeline on
    time + date cases across the non-zh/en languages (VERDICT round-2 gap:
    'the C++ archive interpreter skips time/date entirely')."""
    from funasr_tpu.text.export_grammar import export_grammar
    from funasr_tpu.text.inverse_normalize import InverseNormalizer

    archive_path = str(tmp_path / "grammar_v4.json")
    export_grammar(archive_path)

    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunItnGrammarLoad.restype = ctypes.c_void_p
    lib.FunItnGrammarLoad.argtypes = [ctypes.c_char_p]
    lib.FunItnGrammarApply.restype = ctypes.c_void_p
    lib.FunItnGrammarApply.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_char_p]
    lib.FunASRGetResult.restype = ctypes.c_char_p
    lib.FunASRGetResult.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.FunItnGrammarFree.argtypes = [ctypes.c_void_p]

    g = lib.FunItnGrammarLoad(archive_path.encode())
    assert g

    cases = [
        # times
        ("de", "dreizehn uhr zehn"),
        ("de", "halb zwölf"),
        ("fr", "treize heures cinq"),
        ("fr", "neuf heures"),
        ("es", "las tres cuarenta"),
        ("es", "tres y media"),
        ("pt", "nove horas e cinco"),
        ("ru", "тринадцать часов пять минут"),
        ("id", "jam tujuh lewat lima belas"),
        ("vi", "mười hai giờ năm phút"),
        ("ja", "三時十五分二十秒"),
        ("ja", "三時十五分"),
        ("ko", "두시 삼십분"),
        # dates
        ("de", "vierundzwanzigster juli zweitausenddreizehn"),
        ("ru", "двадцать четыре июля две тысячи тринадцать года"),
        ("vi", "ngày hai mươi tư tháng bảy năm hai nghìn không trăm mười ba"),
    ]
    for lang, text in cases:
        res = lib.FunItnGrammarApply(g, lang.encode(), text.encode())
        assert res, (lang, text)
        cpp_out = lib.FunASRGetResult(res, 0).decode()
        py_out = InverseNormalizer(lang=lang).inverse_normalize(text)
        assert cpp_out == py_out, (lang, text, cpp_out, py_out)
        lib.FunASRFreeResult(ctypes.c_void_p(res))
    lib.FunItnGrammarFree(ctypes.c_void_p(g))


def test_hotword_biased_greedy_decode(built, tiny_model_dir, tmp_path):
    """The bias-aware greedy decode (wfst-decoder/bias-lm role): a compiled
    hotword with a strong boost steers the argmax toward the hotword tokens,
    while hotword=None reproduces the unbiased transcript exactly."""
    import wave

    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.export_runtime import export_native_dir

    am = AutoModel(model=tiny_model_dir, disable_pbar=True)
    out_dir = str(tmp_path / "hw_native")
    export_native_dir(am.model, am.model_params, tiny_model_dir, out_dir)

    rng = np.random.default_rng(21)
    sig = (rng.standard_normal(24000) * 0.1 * 32767).astype(np.int16)
    wav_path = str(tmp_path / "hw.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.tobytes())

    from funasr_tpu import runtime_bins
    asr = runtime_bins.Paraformer(out_dir)
    base = asr(wav_path)[0]["preds"]
    assert base, "no baseline transcript"
    again = asr(wav_path)[0]["preds"]
    assert again == base  # no-hotword path is unchanged and deterministic

    # pick a two-char hotword NOT present in the baseline transcript
    vocab = open(os.path.join(out_dir, "tokens.txt"),
                 encoding="utf-8").read().splitlines()
    chars = [t for t in vocab if len(t) == 1 and t not in base
             and t not in ("<blank>", "<s>", "</s>", "<unk>")]
    hotword = chars[0] + chars[1]
    boosted = asr(wav_path, hotword=hotword, hotword_boost=50.0)[0]["preds"]
    assert hotword in boosted, (hotword, base, boosted)
    # a negligible boost must not change the transcript
    tiny = asr(wav_path, hotword=hotword, hotword_boost=1e-6)[0]["preds"]
    assert tiny == base, (tiny, base)


def test_hotword_seg_dict_en(built, tmp_path):
    """English hotwords compile through seg_dict (the reference seg_dict.cpp
    role) so the trie follows the exact BPE pieces the model emits, not a
    greedy re-tokenization."""
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(["<blank>", "he@@", "llo", "h", "e", "l",
                                 "o", "world"]))
    # without seg_dict, greedy longest-match would pick "he@@"? no — greedy
    # over the raw word "hello" finds "he@@"? "hello"[0:] has no direct
    # match; seg_dict pins the exact pieces
    (tmp_path / "seg_dict").write_text("hello he@@ llo\n")

    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRHotwordCompile.restype = ctypes.c_void_p
    lib.FunASRHotwordCompile.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_float]
    lib.FunASRHotwordStep.restype = ctypes.c_int
    lib.FunASRHotwordStep.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_float)]
    lib.FunASRHotwordFree.argtypes = [ctypes.c_void_p]

    trie = lib.FunASRHotwordCompile(b"hello", str(tokens).encode(),
                                    ctypes.c_float(2.0))
    assert trie
    # walking the seg_dict pieces he@@(1) llo(2) earns the boost both steps
    d = ctypes.c_float(0.0)
    s = lib.FunASRHotwordStep(trie, 0, 1, ctypes.byref(d))
    assert d.value > 0, d.value
    d2 = ctypes.c_float(0.0)
    lib.FunASRHotwordStep(trie, s, 2, ctypes.byref(d2))
    assert d2.value > 0, d2.value
    # per-char walk (h-e-l-l-o) earns nothing: the trie holds the BPE path
    d3 = ctypes.c_float(0.0)
    lib.FunASRHotwordStep(trie, 0, 3, ctypes.byref(d3))
    assert d3.value == 0.0, d3.value
    lib.FunASRHotwordFree(ctypes.c_void_p(trie))


def test_bias_beam_decode(built, tmp_path):
    """Bias-LM beam search (the reference wfst-decoder lattice role): a
    hotword whose first char loses the local argmax is recovered by beam > 1
    on total path score, and an incomplete prefix refunds its pending boost
    at sentence end (bias-lm.cpp semantics)."""
    tokens = tmp_path / "beam_tokens.txt"
    tokens.write_text("\n".join(list("abcdxyz")))
    lib = ctypes.CDLL(str(built / "libfunasr_tpu_runtime.so"))
    lib.FunASRHotwordCompile.restype = ctypes.c_void_p
    lib.FunASRHotwordCompile.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_float]
    lib.FunASRHotwordFree.argtypes = [ctypes.c_void_p]
    lib.FunASRBiasBeamDecode.restype = ctypes.c_int
    lib.FunASRBiasBeamDecode.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    trie = lib.FunASRHotwordCompile(b"ab", str(tokens).encode(),
                                    ctypes.c_float(0.3))
    assert trie

    def decode(logits, beam, use_trie=True):
        arr = np.ascontiguousarray(logits, np.float32)
        n_tok, vocab = arr.shape
        out = (ctypes.c_int * n_tok)()
        n = lib.FunASRBiasBeamDecode(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_tok, vocab,
            trie if use_trie else None, beam, -1, -1, -1, out)
        return list(out[:n])

    A, B, C = 0, 1, 2
    # pos0: "c"(2.0) beats biased "a"(1.55 + 0.3); pos1: "b" completes "ab".
    # greedy-equivalent beam=1 takes [c, b]; beam=4 keeps the "a" hypothesis
    # alive and wins on total score (1.85 + 2.3 > 2.0 + 2.0).
    logits = np.zeros((2, 7), np.float32)
    logits[0, C] = 2.0
    logits[0, A] = 1.55
    logits[1, B] = 2.0
    assert decode(logits, beam=1) == [C, B]
    assert decode(logits, beam=4) == [A, B]
    # without the trie: plain per-position argmax regardless of beam
    assert decode(logits, beam=4, use_trie=False) == [C, B]

    # end-of-sentence refund: "a" starts a hotword that never completes, so
    # its provisional +0.3 is returned and the honest "c" path wins
    short = np.zeros((1, 7), np.float32)
    short[0, A] = 1.9
    short[0, C] = 1.95
    assert decode(short, beam=4) == [C]
    lib.FunASRHotwordFree(ctypes.c_void_p(trie))


def test_hotword_beam_engine_decode(built, tiny_model_dir, tmp_path):
    """Engine-level beam decode through runtime_bins: beam=8 without hotwords
    reproduces the greedy transcript, and a boosted hotword surfaces in the
    beam output just as in the greedy bias path."""
    import wave

    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.export_runtime import export_native_dir

    am = AutoModel(model=tiny_model_dir, disable_pbar=True)
    out_dir = str(tmp_path / "beam_native")
    export_native_dir(am.model, am.model_params, tiny_model_dir, out_dir)

    rng = np.random.default_rng(31)
    sig = (rng.standard_normal(24000) * 0.1 * 32767).astype(np.int16)
    wav_path = str(tmp_path / "beam.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.tobytes())

    from funasr_tpu import runtime_bins
    asr = runtime_bins.Paraformer(out_dir)
    base = asr(wav_path)[0]["preds"]
    assert base
    # beam without a trie short-circuits to the greedy decode
    assert asr(wav_path, beam=8)[0]["preds"] == base

    vocab = open(os.path.join(out_dir, "tokens.txt"),
                 encoding="utf-8").read().splitlines()
    chars = [t for t in vocab if len(t) == 1 and t not in base
             and t not in ("<blank>", "<s>", "</s>", "<unk>")]
    hotword = chars[0] + chars[1]
    boosted = asr(wav_path, hotword=hotword, hotword_boost=50.0,
                  beam=8)[0]["preds"]
    assert hotword in boosted, (hotword, base, boosted)
    # beam keeps a negligible-boost decode at the unbiased transcript
    tiny = asr(wav_path, hotword=hotword, hotword_boost=1e-6,
               beam=8)[0]["preds"]
    assert tiny == base, (tiny, base)
