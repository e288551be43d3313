"""Client-library tests: the runtime/clients python WS client end-to-end
against the 2pass server, plus protocol-constant checks on the static
html5/java/go/c# clients."""

import asyncio
import json
import os
import pathlib
import socket
import sys
import wave

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)
from conftest import stub_reference_deps  # noqa: E402

stub_reference_deps()

CLIENTS = pathlib.Path(__file__).resolve().parents[1] / "runtime" / "clients"
sys.path.insert(0, str(CLIENTS / "python"))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_python_client_offline_roundtrip(tmp_path, tmp_path_factory):
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_auto_model import asr_dir as asr_fixture

    class FakeTPF:
        def mktemp(self, name):
            return tmp_path_factory.mktemp(name)

    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.bin.funasr_wss_server import WSServer
    from funasr_tpu.serving.ws_protocol import serve

    from funasr_tpu_client import FunASRClient, read_pcm16

    d = asr_fixture.__wrapped__(FakeTPF())
    server = WSServer(asr_model=AutoModel(model=d, disable_pbar=True))
    port = _free_port()

    rng = np.random.default_rng(0)
    wav_path = str(tmp_path / "a.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((rng.standard_normal(16000) * 0.1 * 32767)
                      .astype(np.int16).tobytes())

    async def scenario():
        srv = await serve(server.handle, "127.0.0.1", port)
        try:
            partials = []
            # generous final wait: the fresh AutoModel's first decode compiles
            # under whatever load the test host is carrying
            async with FunASRClient("127.0.0.1", port, mode="offline",
                                    final_timeout=240) as cli:
                text = await cli.transcribe(read_pcm16(wav_path), "utt1",
                                            on_partial=partials.append)
            return text, partials
        finally:
            srv.close()
            await srv.wait_closed()

    text, partials = asyncio.run(scenario())
    assert isinstance(text, str)
    assert partials and partials[-1]["wav_name"] == "utt1"
    assert partials[-1]["is_final"] is True


@pytest.mark.parametrize("relpath, needles", [
    ("html5/client.js", ['"mode"', "chunk_size", "is_speaking", "WebSocket"]),
    ("html5/index.html", ["client.js"]),
    ("java/FunasrTpuWsClient.java", ["chunk_size", "is_speaking",
                                     "java.net.http.WebSocket"]),
    ("golang/client.go", ["chunk_size", "is_speaking",
                          "Sec-WebSocket-Key"]),
    ("csharp/FunasrTpuWsClient.cs", ["chunk_size", "is_speaking",
                                     "ClientWebSocket"]),
    ("android/FunasrTpuClient.kt", ["chunk_size", "is_speaking",
                                    "AudioRecord"]),
    ("ios/FunasrTpuClient.swift", ["chunk_size", "is_speaking",
                                   "URLSessionWebSocketTask"]),
])
def test_client_sources_speak_the_protocol(relpath, needles):
    src = (CLIENTS / relpath).read_text()
    for needle in needles:
        assert needle in src, f"{relpath} missing {needle!r}"


def test_langchain_tool_transcribes(tmp_path, tmp_path_factory):
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_auto_model import asr_dir as asr_fixture

    class FakeTPF:
        def mktemp(self, name):
            return tmp_path_factory.mktemp(name)

    d = asr_fixture.__wrapped__(FakeTPF())
    rng = np.random.default_rng(1)
    wav_path = str(tmp_path / "b.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((rng.standard_normal(16000) * 0.1 * 32767)
                      .astype(np.int16).tobytes())

    from funasr_tpu.integrations.langchain_tool import FunASRTool
    tool = FunASRTool(model=d, disable_pbar=True)
    out = tool.run(wav_path)
    assert isinstance(out, str)
    spec = tool.as_openai_function()
    assert spec["function"]["name"] == "transcribe_audio"


@pytest.mark.parametrize("tool,args,reason", [
    ("go", ["build", "-o", "/dev/null", "."], "golang"),
    ("javac", ["-d", None, "FunasrTpuWsClient.java"], "java"),
    ("kotlinc", ["-help"], "android"),
])
def test_client_compiles_when_toolchain_present(tool, args, reason, tmp_path):
    """Build (not just grep) each non-Python client whenever its toolchain is
    installed; absent toolchains skip with the exact binary named, so the gap
    is visible in the test report rather than silent."""
    import shutil
    import subprocess

    if shutil.which(tool) is None:
        pytest.skip(f"toolchain '{tool}' not installed in this image")
    srcdir = CLIENTS / reason
    argv = [tool] + [str(tmp_path) if a is None else a for a in args]
    r = subprocess.run(argv, cwd=srcdir, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr


def test_openclaw_plugin_sources():
    """OpenClaw voice plugin (reference integrations/openclaw/ role): the TS
    provider speaks the funasr_tpu WS protocol and the G.711 conversion
    matches the python decoder on the ITU-T reference points."""
    root = CLIENTS.parent.parent / "integrations" / "openclaw"
    provider = (root / "src" / "realtime-transcription-provider.ts").read_text()
    for needle in ("chunk_size", "is_speaking", "hotwords", "2pass",
                   "binary", "FUNASR_WS_URL"):
        assert needle in provider, needle
    audio = (root / "src" / "audio.ts").read_text()
    for needle in ("0x84", "upsample8kTo16k", "960"):
        assert needle in audio, needle
    manifest = json.loads((root / "openclaw.plugin.json").read_text())
    assert manifest["id"] == "funasr-tpu"

    # the python decoder agrees with the TS constants on the ITU-T extremes
    from funasr_tpu.utils.load_utils import _g711_ulaw_decode
    pts = _g711_ulaw_decode(np.array([0xFF, 0x80, 0x00], np.uint8))
    assert np.allclose(pts * 32768.0, [0.0, 32124.0, -32124.0])


def test_g711_wav_decode(tmp_path):
    """G.711 mu-law/A-law WAV files (telephony / openclaw voice path) decode
    through load_audio within the codec's quantization error."""
    import struct

    from funasr_tpu.utils.load_utils import load_audio

    t = np.arange(1600)
    sig = (0.5 * np.sin(2 * np.pi * 440 * t / 8000) * 32767).astype(np.int16)

    def ulaw_encode(x16):
        x = np.clip(x16.astype(np.int32), -32635, 32635)
        sign = np.where(x < 0, 0x80, 0)
        x = np.abs(x) + 0x84
        exponent = np.clip(np.floor(
            np.log2(np.maximum(x >> 7, 1))).astype(np.int32), 0, 7)
        mantissa = (x >> (exponent + 3)) & 0x0F
        return ((~(sign | (exponent << 4) | mantissa)) & 0xFF).astype(np.uint8)

    payload = ulaw_encode(sig).tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(payload),
                      b"WAVE", b"fmt ", 16, 7, 1, 8000, 8000, 1, 8, b"data",
                      len(payload))
    path = tmp_path / "ulaw.wav"
    path.write_bytes(hdr + payload)
    wav = np.asarray(load_audio(str(path), fs=8000))
    err = np.abs(wav - sig.astype(np.float32) / 32768.0).max()
    assert err < 0.05, err
