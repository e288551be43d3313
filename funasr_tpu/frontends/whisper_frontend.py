"""Whisper log-mel frontend (counterpart of FunASR
``funasr/frontends/whisper_frontend.py``): n_fft 400, hop 160, slaney-normalized mel
filters, log10 with dynamic-range clamp and (x+4)/4 scaling."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.register import tables


@functools.lru_cache(maxsize=4)
def slaney_mel_filters(n_mels: int = 80, n_fft: int = 400, sr: int = 16000):
    """librosa-style slaney mel filterbank (what whisper ships as mel_filters.npz)."""
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0)
                       / np.log(6.4) * 27.0, mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) * (m - 15.0) / 27.0), f)
        return f

    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0),
                                    n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2: n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)  # (n_mels, n_freqs)


@tables.register("frontend_classes", "WhisperFrontend")
class WhisperFrontend:
    def __init__(self, fs: int = 16000, n_mels: int = 80, n_fft: int = 400,
                 hop_length: int = 160, whisper_model: str = "large-v3",
                 do_pad_trim: bool = True, pad_samples: int = 480000, **kwargs):
        self.fs = fs
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.frame_shift_ms = hop_length * 1000 // fs
        self.lfr_n = 1
        self.do_pad_trim = do_pad_trim
        self.pad_samples = pad_samples

    def output_size(self):
        return self.n_mels

    def log_mel(self, wav):
        """wav: (N,) float in [-1,1] -> (T, n_mels) whisper log-mel."""
        window = jnp.asarray(np.hanning(self.n_fft + 1)[:-1].astype(np.float32))
        n = wav.shape[0]
        pad = self.n_fft // 2
        x = jnp.pad(wav, (pad, pad), mode="reflect")
        t = 1 + (x.shape[0] - self.n_fft) // self.hop_length
        idx = jnp.arange(t)[:, None] * self.hop_length + jnp.arange(self.n_fft)
        frames = x[idx] * window
        spec = jnp.fft.rfft(frames, axis=-1)
        mag = jnp.square(jnp.abs(spec))[:-1]  # whisper drops the last frame
        mel = jnp.matmul(mag, jnp.asarray(slaney_mel_filters(
            self.n_mels, self.n_fft, self.fs)).T,
            preferred_element_type=jnp.float32)
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
        return (log_spec + 4.0) / 4.0

    def extract(self, waveforms):
        feats = []
        for w in waveforms:
            w = np.asarray(w, np.float32)
            if self.do_pad_trim:
                w = w[: self.pad_samples]
                if w.shape[0] < self.pad_samples:
                    w = np.pad(w, (0, self.pad_samples - w.shape[0]))
            feats.append(np.asarray(self.log_mel(jnp.asarray(w))))
        lens = np.asarray([f.shape[0] for f in feats], np.int32)
        maxlen = int(lens.max())
        out = np.zeros((len(feats), maxlen, self.n_mels), np.float32)
        for i, f in enumerate(feats):
            out[i, : f.shape[0]] = f
        return out, lens
