"""Host-side audio/text loading (counterpart of FunASR ``funasr/utils/load_utils.py``:
``load_audio_text_image_video:48``, ``load_bytes:306``, ``extract_fbank:381``).

Decodes WAV/PCM natively (no torchaudio/ffmpeg in this environment); resamples with
``scipy.signal.resample_poly``; returns float32 waveforms in [-1, 1). Feature
extraction happens on device via the frontend (bucketed batch fbank).
"""

from __future__ import annotations

import io
import math
import os
import struct
from typing import Any, List, Tuple

import numpy as np


def _g711_ulaw_decode(u8: np.ndarray) -> np.ndarray:
    """ITU-T G.711 mu-law -> float32 in [-1, 1] (telephony WAV format 7)."""
    u = (~u8).astype(np.int32) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = ((mantissa << 3) + 0x84 << exponent) - 0x84
    return np.where(sign, -mag, mag).astype(np.float32) / 32768.0


def _g711_alaw_decode(a8: np.ndarray) -> np.ndarray:
    """ITU-T G.711 A-law -> float32 in [-1, 1] (telephony WAV format 6)."""
    a = (a8.astype(np.int32) ^ 0x55) & 0xFF
    sign = a & 0x80
    exponent = (a >> 4) & 0x07
    mantissa = a & 0x0F
    mag = np.where(exponent == 0, (mantissa << 4) + 8,
                   ((mantissa << 4) + 0x108) << (exponent - 1))
    # A-law transmits bit 7 = 1 for POSITIVE samples (opposite of mu-law)
    return np.where(sign, mag, -mag).astype(np.float32) / 32768.0


def _parse_wav_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """Minimal RIFF/WAVE parser: PCM16/24/32, float32, G.711 mu-law/A-law,
    mono/multi-channel."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif chunk_id == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 3 or (audio_format == 0xFFFE and bits == 32):
        wav = np.frombuffer(raw, dtype=np.float32)
    elif audio_format == 7:  # G.711 mu-law (telephony; openclaw voice path)
        wav = _g711_ulaw_decode(np.frombuffer(raw, dtype=np.uint8))
    elif audio_format == 6:  # G.711 A-law
        wav = _g711_alaw_decode(np.frombuffer(raw, dtype=np.uint8))
    elif bits == 16:
        wav = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif bits == 32:
        wav = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    elif bits == 8:
        wav = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        vals = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16))
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        wav = vals.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported wav: format={audio_format} bits={bits}")
    if channels > 1:
        wav = wav.reshape(-1, channels).mean(axis=1)
    return np.ascontiguousarray(wav), sample_rate


def is_audio_container(data: bytes) -> bool:
    """Container sniff (reference ``_is_audio_container:272``)."""
    if len(data) < 12:
        return False
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return True
    if data[:4] == b"fLaC" or data[:4] == b"OggS" or data[:3] == b"ID3":
        return True
    if data[:2] in (b"\xff\xfb", b"\xff\xf3", b"\xff\xf2", b"\xff\xe3"):
        return True  # mp3 frame sync
    if data[4:8] == b"ftyp":
        return True  # mp4/m4a
    return False


def load_bytes(data: bytes) -> np.ndarray:
    """Raw 16-bit PCM bytes -> float32 (reference ``load_bytes:306``)."""
    return np.frombuffer(data, dtype=np.int16).astype(np.float32) / 32768.0


def _ffmpeg_decode(data: bytes, fs: int) -> np.ndarray:
    """ffmpeg-subprocess fallback (reference load_utils.py:272-306 role)."""
    import shutil
    import subprocess
    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg binary not found")
    proc = subprocess.run(
        ["ffmpeg", "-nostdin", "-v", "error", "-i", "pipe:0", "-f", "f32le",
         "-ac", "1", "-ar", str(fs), "pipe:1"],
        input=data, stdout=subprocess.PIPE, stderr=subprocess.PIPE, check=False)
    if proc.returncode != 0 or not proc.stdout:
        raise RuntimeError(f"ffmpeg decode failed: {proc.stderr[:200]!r}")
    return np.frombuffer(proc.stdout, np.float32).copy()


def decode_container(data: bytes, fs: int) -> np.ndarray:
    """Compressed container bytes (mp3/flac/ogg/mp4/webm/opus) -> mono f32 @ fs.

    Chain: native runtime codec (libav* via ctypes) -> ffmpeg subprocess.
    WAV is parsed natively before reaching here.
    """
    from funasr_tpu.utils import native_codec
    wav = native_codec.decode_bytes(data, target_rate=fs)
    if wav is not None:
        return wav
    try:
        return _ffmpeg_decode(data, fs)
    except RuntimeError as e:
        raise RuntimeError(
            "cannot decode compressed audio: build the native runtime "
            "(runtime/funasr_tpu_runtime, links system libav*) or install "
            f"ffmpeg ({e})") from e


def resample(wav: np.ndarray, orig_fs: int, target_fs: int) -> np.ndarray:
    if orig_fs == target_fs:
        return wav
    from scipy.signal import resample_poly
    g = math.gcd(orig_fs, target_fs)
    return resample_poly(wav, target_fs // g, orig_fs // g).astype(np.float32)


def as_unit_f32(wav: np.ndarray) -> np.ndarray:
    """Any loaded waveform -> float32 in [-1, 1) (int16 PCM rescaled by 1/32768).

    Consumers that bypass ``extract_fbank`` (speaker fbanks, raw-waveform
    models, streaming VAD) call this to undo the int16 device-passthrough
    that ``load_audio`` keeps for PCM16-capable frontends."""
    if getattr(wav, "dtype", None) == np.int16:
        return wav.astype(np.float32) / 32768.0
    return np.asarray(wav, np.float32)


def as_pcm16_f32(wav: np.ndarray) -> np.ndarray:
    """Any loaded waveform -> float32 at PCM16 scale (unit floats x32768).

    The scale kaldi-style fbank expects (reference feeds
    ``waveform * 32768`` into its frontends)."""
    if getattr(wav, "dtype", None) == np.int16:
        return wav.astype(np.float32)
    return np.asarray(wav, np.float32) * 32768.0


def load_audio(source: Any, fs: int = 16000, audio_fs: int = 16000) -> np.ndarray:
    """One source (path / bytes / ndarray / list of samples) -> mono @ fs.

    Returns float32 in [-1, 1), EXCEPT a 1-D int16 ndarray at the target rate,
    which passes through as int16 so PCM16-capable device frontends convert
    on-chip (half the upload bytes, bit-exact). Downstream code that needs a
    float waveform normalizes via ``as_unit_f32`` / ``as_pcm16_f32``."""
    if isinstance(source, np.ndarray):
        if source.dtype == np.int16:
            # raw PCM16: keep int16 when no resample is needed — the device
            # frontend converts on-chip (half the upload bytes, bit-exact;
            # frontends that can't take PCM16 get a float conversion in
            # extract_fbank). Previously int16 arrays were silently treated
            # as float at PCM scale, i.e. 32768x too loud.
            if source.ndim == 1 and audio_fs == fs:
                return source
            source = source.astype(np.float32) / 32768.0
        wav = source.astype(np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=-1 if wav.shape[-1] <= 8 else 0)
        return resample(wav, audio_fs, fs)
    if isinstance(source, (bytes, bytearray)):
        data = bytes(source)
        if is_audio_container(data):
            if data[:4] == b"RIFF":
                wav, sr = _parse_wav_bytes(data)
                return resample(wav, sr, fs)
            return decode_container(data, fs)
        return resample(load_bytes(data), audio_fs, fs)
    if isinstance(source, str):
        if source.startswith(("http://", "https://")):
            import urllib.error
            import urllib.request
            try:
                with urllib.request.urlopen(source, timeout=30) as resp:
                    data = resp.read()
            except (urllib.error.URLError, OSError) as e:
                raise RuntimeError(
                    f"failed to fetch {source} (network unavailable?): {e}"
                ) from e
            return load_audio(data, fs=fs, audio_fs=audio_fs)
        ext = os.path.splitext(source)[1].lower()
        with open(source, "rb") as f:
            data = f.read()
        if ext == ".pcm":
            return resample(load_bytes(data), audio_fs, fs)
        if data[:4] == b"RIFF":
            wav, sr = _parse_wav_bytes(data)
            return resample(wav, sr, fs)
        if is_audio_container(data) or ext in (".mp3", ".flac", ".ogg", ".m4a",
                                               ".mp4", ".webm", ".opus", ".aac"):
            return decode_container(data, fs)
        wav, sr = _parse_wav_bytes(data)
        return resample(wav, sr, fs)
    if isinstance(source, (list, tuple)):
        return resample(np.asarray(source, dtype=np.float32), audio_fs, fs)
    raise TypeError(f"unsupported audio source type {type(source)}")


def load_audio_text_image_video(data_in, fs: int = 16000, audio_fs: int = 16000,
                                data_type: str = "sound", tokenizer=None, **kwargs):
    """Normalize inputs to a list (reference ``load_audio_text_image_video:48``).

    sound -> list of float32 waveforms; text -> list of token-id arrays / raw strings.
    """
    single = not isinstance(data_in, (list, tuple))
    items = [data_in] if single else list(data_in)
    out = []
    for item in items:
        if data_type == "text":
            if tokenizer is not None and isinstance(item, str):
                out.append(np.asarray(tokenizer.encode(item), dtype=np.int32))
            else:
                out.append(item)
        else:
            out.append(load_audio(item, fs=fs, audio_fs=audio_fs))
    return out


def extract_fbank(audio_list: List[np.ndarray], data_type: str = "sound",
                  frontend=None, is_final: bool = True, cache=None,
                  device: bool = False):
    """List of waveforms -> (feats (B, T, D), lens (B,)).

    Delegates to the frontend's batched device pipeline (bucketed shapes).
    ``device=True`` keeps the features on device when the frontend supports it
    (models with a bucketed jit decode path consume them without a host trip).
    """
    if data_type == "fbank":
        feats = audio_list
        lens = np.asarray([f.shape[0] for f in feats], np.int32)
        maxlen = max(int(l) for l in lens)
        out = np.zeros((len(feats), maxlen, feats[0].shape[-1]), np.float32)
        for i, f in enumerate(feats):
            out[i, : f.shape[0]] = f
        return out, lens
    if not getattr(frontend, "supports_pcm16", False) or cache is not None:
        # frontends without a PCM16 device path take float [-1, 1)
        audio_list = [w.astype(np.float32) / 32768.0
                      if getattr(w, "dtype", None) == np.int16 else w
                      for w in audio_list]
    if cache is not None:
        return frontend.forward_streaming(audio_list, cache=cache, is_final=is_final)
    if device and getattr(frontend, "supports_device_extract", False):
        return frontend.extract(audio_list, device=True)
    return frontend.extract(audio_list)
