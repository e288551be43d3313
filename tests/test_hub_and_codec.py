"""Hub snapshot download (mocked network) + compressed-audio decode."""

import io
import json
import os
import urllib.request

import numpy as np
import pytest


def test_snapshot_download_ms_mocked(tmp_path, monkeypatch):
    """snapshot_download fetches the ModelScope file list + files into the cache
    atomically, and resolve_model_dir picks the snapshot up."""
    from funasr_tpu.download import download_model_from_hub as hub

    model_id = "iic/tiny-model"
    listing = {"Data": {"Files": [
        {"Path": "config.yaml", "Type": "blob"},
        {"Path": "tokens.txt", "Type": "blob"},
        {"Path": "sub/extra.bin", "Type": "blob"},
    ]}}
    payloads = {
        f"https://modelscope.cn/api/v1/models/{model_id}/repo/files?Recursive=true":
            json.dumps(listing).encode(),
        f"https://modelscope.cn/api/v1/models/{model_id}/repo?FilePath=config.yaml":
            b"model: Paraformer\n",
        f"https://modelscope.cn/api/v1/models/{model_id}/repo?FilePath=tokens.txt":
            b"<blank>\n",
        f"https://modelscope.cn/api/v1/models/{model_id}/repo?FilePath=sub/extra.bin":
            b"\x00\x01",
    }

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        url = req.get_full_url() if hasattr(req, "get_full_url") else req
        if url not in payloads:
            raise urllib.error.URLError(f"unknown {url}")
        return FakeResp(payloads[url])

    import urllib.error
    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    monkeypatch.setenv("FUNASR_TPU_CACHE", str(tmp_path))

    out = hub.snapshot_download(model_id, hub="ms", cache_dir=str(tmp_path))
    assert out == str(tmp_path / model_id)
    assert open(tmp_path / model_id / "config.yaml").read() == "model: Paraformer\n"
    assert (tmp_path / model_id / "sub" / "extra.bin").exists()
    assert not (tmp_path / f"{model_id}.partial").exists()

    # resolve_model_dir finds the cached snapshot without touching the network
    monkeypatch.setattr(urllib.request, "urlopen",
                        lambda *a, **k: (_ for _ in ()).throw(AssertionError))
    assert hub.resolve_model_dir(model_id) == str(tmp_path / model_id)


def test_resolve_offline_degrades_gracefully(tmp_path, monkeypatch):
    import urllib.error
    from funasr_tpu.download import download_model_from_hub as hub

    monkeypatch.setenv("FUNASR_TPU_CACHE", str(tmp_path))

    def dead_urlopen(*a, **k):
        raise urllib.error.URLError("no route to host")

    monkeypatch.setattr(urllib.request, "urlopen", dead_urlopen)
    with pytest.raises(FileNotFoundError, match="hub download failed"):
        hub.resolve_model_dir("iic/never-cached-model")

    monkeypatch.setenv("FUNASR_TPU_OFFLINE", "1")
    with pytest.raises(FileNotFoundError, match="FUNASR_TPU_OFFLINE"):
        hub.resolve_model_dir("iic/never-cached-model")


MP3 = "/root/reference/runtime/funasr_api/asr_example.mp3"
LIB = "/root/repo/runtime/funasr_tpu_runtime/build/libfunasr_tpu_runtime.so"


@pytest.mark.skipif(not (os.path.exists(MP3) and os.path.exists(LIB)),
                    reason="needs reference mp3 + built native runtime")
def test_mp3_decode_native():
    """mp3 path AND raw bytes decode through the native libav codec; target-rate
    resample happens inside the codec (16k vs 8k ~ 2x samples)."""
    from funasr_tpu.utils.load_utils import load_audio

    wav = load_audio(MP3, fs=16000)
    assert wav.dtype == np.float32 and 80000 < wav.shape[0] < 100000
    assert 0.1 < float(np.abs(wav).max()) <= 1.0
    with open(MP3, "rb") as f:
        wav_b = load_audio(f.read(), fs=16000)
    assert wav_b.shape == wav.shape
    wav8 = load_audio(MP3, fs=8000)
    assert abs(wav.shape[0] / wav8.shape[0] - 2.0) < 0.01


def test_container_sniffing_routes():
    """Non-WAV magic bytes route to decode_container; raw PCM does not."""
    from funasr_tpu.utils import load_utils

    assert load_utils.is_audio_container(b"fLaC" + b"\x00" * 16)
    assert load_utils.is_audio_container(b"OggS" + b"\x00" * 16)
    assert load_utils.is_audio_container(b"ID3\x04" + b"\x00" * 16)
    assert not load_utils.is_audio_container(b"\x01\x02" * 16)
    pcm = (np.sin(np.arange(1600) / 10) * 20000).astype(np.int16).tobytes()
    wav = load_utils.load_audio(pcm, fs=16000)
    assert wav.shape[0] == 1600
