"""Kaldi-compatible log-mel filterbank, TPU-native.

Re-implements the behavior of ``torchaudio.compliance.kaldi.fbank`` as used by the
reference frontend (FunASR ``funasr/frontends/wav_frontend.py:171-182``: hamming window,
25 ms / 10 ms, snip_edges, energy_floor=0, remove_dc_offset, preemphasis 0.97,
power spectrum, kaldi mel banks with low_freq 20) as a static-shape jnp pipeline:

    frame gather -> dither -> dc removal -> preemph -> window -> rfft(512) ->
    |.|^2 -> (T,257)@(257,M) mel matmul -> log

The mel projection is a single matmul (MXU) and everything before it is fused
elementwise VPU work; XLA's TPU FFT handles the rfft. All shapes are static given the
waveform-bucket length, so one compilation per bucket.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1.1920928955078125e-07  # float32 eps, the kaldi/torchaudio log floor


def mel_scale(freq):
    return 1127.0 * np.log1p(np.asarray(freq, np.float64) / 700.0)


@functools.lru_cache(maxsize=8)
def kaldi_mel_banks(
    num_bins: int = 80,
    padded_window_size: int = 512,
    sample_freq: float = 16000.0,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi triangular mel bank matrix, shape (padded_window_size//2 + 1, num_bins).

    Last fft bin (nyquist) row is zero, matching kaldi's bank computed over nfft/2 bins.
    """
    num_fft_bins = padded_window_size // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = high_freq + nyquist
    fft_bin_width = sample_freq / padded_window_size
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_idx = np.arange(num_bins, dtype=np.float64)[:, None]
    left_mel = mel_low + bin_idx * mel_delta
    center_mel = left_mel + mel_delta
    right_mel = center_mel + mel_delta

    fft_mels = mel_scale(fft_bin_width * np.arange(num_fft_bins, dtype=np.float64))[None, :]
    up = (fft_mels - left_mel) / (center_mel - left_mel)
    down = (right_mel - fft_mels) / (right_mel - center_mel)
    banks = np.maximum(0.0, np.minimum(up, down))
    banks = np.concatenate([banks, np.zeros((num_bins, 1))], axis=1)  # nyquist bin
    return np.ascontiguousarray(banks.T.astype(np.float32))  # (nfft//2+1, num_bins)


def feature_window(window_type: str, size: int) -> np.ndarray:
    n = np.arange(size, dtype=np.float64)
    a = 2.0 * math.pi / (size - 1)
    if window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * n)
    elif window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * n)
    elif window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * n)) ** 0.85
    elif window_type == "rectangular":
        w = np.ones(size)
    elif window_type == "blackman":
        blackman_coeff = 0.42
        w = (
            blackman_coeff
            - 0.5 * np.cos(a * n)
            + (0.5 - blackman_coeff) * np.cos(2 * a * n)
        )
    else:
        raise ValueError(f"unknown window type {window_type}")
    return w.astype(np.float32)


def num_frames(num_samples: int, frame_length: int = 400, frame_shift: int = 160,
               snip_edges: bool = True) -> int:
    if snip_edges:
        if num_samples < frame_length:
            return 0
        return 1 + (num_samples - frame_length) // frame_shift
    return (num_samples + frame_shift // 2) // frame_shift


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@functools.lru_cache(maxsize=4)
def _dft_matrix(nfft: int, frame_length: int):
    """(frame_length, 2*(nfft//2+1)) real-DFT matrix [cos | -sin].

    Row k of rfft(pad(x, nfft)) equals x @ cos_k - i * (x @ sin_k); only the
    first ``frame_length`` rows are kept since the pad region contributes 0."""
    nbins = nfft // 2 + 1
    n = np.arange(nfft, dtype=np.float64)[:, None]
    k = np.arange(nbins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / nfft
    m = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)
    return m[:frame_length].astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_mel_bins", "frame_length", "frame_shift", "sample_frequency",
        "window_type", "snip_edges", "low_freq", "high_freq",
        "remove_dc_offset", "preemphasis_coefficient", "use_power", "dither",
    ),
)
def fbank(
    waveform,
    *,
    num_mel_bins: int = 80,
    frame_length: int = 400,
    frame_shift: int = 160,
    sample_frequency: float = 16000.0,
    dither: float = 0.0,
    dither_rng=None,
    window_type: str = "hamming",
    snip_edges: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    remove_dc_offset: bool = True,
    preemphasis_coefficient: float = 0.97,
    use_power: bool = True,
):
    """waveform: (N,) float32 (already scaled, e.g. *32768) -> (T, num_mel_bins) fp32.

    ``T`` is static from N (snip_edges framing). ``dither`` is applied only when
    ``dither_rng`` is given (training).
    """
    n = waveform.shape[0]
    t = num_frames(n, frame_length, frame_shift, snip_edges)
    if t == 0:
        return jnp.zeros((0, num_mel_bins), jnp.float32)

    # Framing without a gather (gathers are slow on TPU): frame starts are aligned
    # to frame_shift, so reshape into shift-sized rows and concatenate ceil(L/S)+1
    # adjacent rows per frame, then slice to frame_length — pure reshapes/slices.
    w = waveform.astype(jnp.float32)
    rows_per_frame = -(-frame_length // frame_shift)  # ceil
    n_rows = t - 1 + rows_per_frame
    pad_n = n_rows * frame_shift
    if pad_n > n:
        w = jnp.pad(w, (0, pad_n - n))
    rows = w[: pad_n].reshape(n_rows, frame_shift)
    frames = jnp.concatenate(
        [rows[i: i + t] for i in range(rows_per_frame)], axis=1)[:, :frame_length]

    if dither != 0.0 and dither_rng is not None:
        frames = frames + dither * jax.random.normal(dither_rng, frames.shape, jnp.float32)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    if preemphasis_coefficient != 0.0:
        prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis_coefficient * prev

    frames = frames * jnp.asarray(feature_window(window_type, frame_length))

    nfft = _next_pow2(frame_length)
    # Real DFT as ONE matmul instead of jnp.fft.rfft: at kaldi sizes
    # (nfft 512, 257 bins) the MXU runs the (T,512)@(512,514) product ~4x
    # faster than XLA's TPU FFT lowering, and the windowed frames are only
    # 400 samples wide so the zero-padded FFT wastes further work. HIGHEST
    # precision keeps f32 accuracy for the golden torchaudio parity tests.
    dft = jnp.asarray(_dft_matrix(nfft, frame_length))
    spec2 = jax.lax.dot_general(
        frames, dft, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    nbins = nfft // 2 + 1
    power = jnp.square(spec2[:, :nbins]) + jnp.square(spec2[:, nbins:])
    if not use_power:
        power = jnp.sqrt(power)

    banks = jnp.asarray(
        kaldi_mel_banks(num_mel_bins, nfft, sample_frequency, low_freq, high_freq)
    )
    mel = jnp.matmul(power, banks, preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(mel, EPSILON))


def fbank_batch(waveforms, lengths, dither: float = 0.0, dither_rng=None, **kwargs):
    """(B, N) waveforms + (B,) sample lengths -> ((B, T, M) feats, (B,) frame lengths).

    Frames whose window crosses a sample-length boundary are garbage for that row; the
    returned frame lengths mask them. Static shapes: T from the padded N. ``dither``
    (kaldi-style gaussian noise, reference wav_frontend.py:120) is applied only when
    ``dither_rng`` is given (training); each row gets an independent key.
    """
    if dither != 0.0 and dither_rng is not None:
        keys = jax.random.split(dither_rng, waveforms.shape[0])
        feats = jax.vmap(
            lambda w, k: fbank(w, dither=dither, dither_rng=k, **kwargs)
        )(waveforms, keys)
    else:
        feats = jax.vmap(lambda w: fbank(w, **kwargs))(waveforms)
    frame_length = kwargs.get("frame_length", 400)
    frame_shift = kwargs.get("frame_shift", 160)
    flens = jnp.where(
        lengths < frame_length, 0, 1 + (lengths - frame_length) // frame_shift
    ).astype(jnp.int32)
    return feats, flens
