"""Mel23 (EEND) + FusedFrontends coverage."""

import numpy as np
import pytest


def test_mel23_registered_and_shapes():
    import funasr_tpu  # noqa: F401
    from funasr_tpu.register import tables

    assert "WavFrontendMel23" in tables.frontend_classes
    assert "FusedFrontends" in tables.frontend_classes

    fe = tables.frontend_classes["WavFrontendMel23"](
        fs=8000, frame_length=200, frame_shift=80, lfr_m=7, lfr_n=10)
    assert fe.output_size() == 345  # EEND input_size
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(8000).astype(np.float32),
            rng.standard_normal(4001).astype(np.float32)]
    feats, lens = fe.extract(wavs)
    assert feats.shape[0] == 2 and feats.shape[2] == 345
    assert lens[0] > lens[1] > 0
    # per-utterance mean normalization: the center (current-frame) block of a
    # full-length splice has ~zero mean over valid frames
    center = feats[0, : lens[0], 7 * 23: 8 * 23]
    assert abs(center.mean()) < 0.3


def test_mel23_stft_matches_dft():
    """The centered STFT agrees with a direct DFT of the windowed frame."""
    from funasr_tpu.frontends.mel23 import stft_centered

    rng = np.random.default_rng(1)
    wav = rng.standard_normal(801).astype(np.float32)
    frame, shift = 200, 80
    n_fft = 256
    spec = stft_centered(wav, frame, shift)
    # frame k covers padded[k*shift : k*shift + n_fft]
    padded = np.pad(wav.astype(np.float64), n_fft // 2, mode="reflect")
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)
    window = np.zeros(n_fft)
    window[(n_fft - frame) // 2: (n_fft - frame) // 2 + frame] = win
    k = 3
    manual = np.fft.rfft(padded[k * shift: k * shift + n_fft] * window)
    np.testing.assert_allclose(spec[k], manual, rtol=1e-10, atol=1e-10)


def test_fused_frontends_linear_projection():
    import jax
    from funasr_tpu.frontends.fused import FusedFrontends

    fe = FusedFrontends(frontends=[
        dict(frontend_type="default", n_mels=40, hop_length=160,
             win_length=400, n_fft=512),
        dict(frontend_type="default", n_mels=80, hop_length=320,
             win_length=400, n_fft=512),
    ], proj_dim=32, fs=16000)
    assert fe.output_size() == 64
    assert fe.factors == [1, 2]  # gcd 160: second stream re-expands 2x
    params = fe.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(16000).astype(np.float32),
            rng.standard_normal(8000).astype(np.float32)]
    feats, lens = fe.extract(wavs, params=params)
    assert feats.shape[0] == 2 and feats.shape[2] == 64
    assert np.isfinite(feats).all()


def test_wav_frontend_int16_fast_path_bit_exact():
    """int16 PCM input (half the upload bytes) produces bit-identical
    features to the equivalent float32 input (int16 / 32768)."""
    from funasr_tpu.frontends.wav_frontend import WavFrontend

    fe = WavFrontend(fs=16000, n_mels=80, lfr_m=7, lfr_n=6, dither=0.0)
    rng = np.random.default_rng(3)
    pcm = (rng.standard_normal(12000) * 0.2 * 32767).astype(np.int16)
    short = (rng.standard_normal(5000) * 0.1 * 32767).astype(np.int16)
    f_i16, l_i16 = fe.extract([pcm, short])
    f_f32, l_f32 = fe.extract([pcm.astype(np.float32) / 32768.0,
                               short.astype(np.float32) / 32768.0])
    np.testing.assert_array_equal(l_i16, l_f32)
    np.testing.assert_array_equal(f_i16, f_f32)
