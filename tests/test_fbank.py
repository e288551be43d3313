"""Golden tests for the kaldi-compatible fbank.

The oracle is an independent numpy implementation written directly from the kaldi
feature-extraction definition (naive DFT, per-frame loops) — structurally different
from the vectorized jnp pipeline, so shared bugs are unlikely.
"""

import numpy as np
import pytest

from funasr_tpu.ops.fbank import fbank, fbank_batch, kaldi_mel_banks, num_frames


def _mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


def oracle_fbank(wave, n_mels=80, flen=400, fshift=160, fs=16000.0):
    nf = 1 + (len(wave) - flen) // fshift if len(wave) >= flen else 0
    nfft = 512
    # mel banks, naive per-bin loop
    low, high = 20.0, fs / 2
    mlow, mhigh = _mel(low), _mel(high)
    delta = (mhigh - mlow) / (n_mels + 1)
    bin_mels = _mel(np.arange(nfft // 2) * fs / nfft)
    banks = np.zeros((n_mels, nfft // 2 + 1))
    for j in range(n_mels):
        l, c, r = mlow + j * delta, mlow + (j + 1) * delta, mlow + (j + 2) * delta
        for i in range(nfft // 2):
            m = bin_mels[i]
            if l < m < r:
                banks[j, i] = (m - l) / (c - l) if m <= c else (r - m) / (r - c)
    n = np.arange(flen)
    window = 0.54 - 0.46 * np.cos(2 * np.pi * n / (flen - 1))
    out = np.zeros((nf, n_mels))
    for t in range(nf):
        frame = wave[t * fshift : t * fshift + flen].astype(np.float64).copy()
        frame -= frame.mean()
        pre = np.concatenate([[frame[0]], frame[:-1]])
        frame = frame - 0.97 * pre
        frame *= window
        spec = np.fft.rfft(frame, nfft)
        power = np.abs(spec) ** 2
        mel = banks @ power
        out[t] = np.log(np.maximum(mel, 1.1920928955078125e-07))
    return out


def test_mel_banks_match_oracle():
    banks = kaldi_mel_banks(80, 512, 16000.0)
    # sanity: non-negative, each column (fft bin) sums <= ~1, rows non-empty
    assert banks.shape == (257, 80)
    assert banks.min() >= 0.0
    assert (banks.sum(axis=0) > 0).sum() > 70


def test_fbank_matches_oracle(rng):
    wave = (rng.standard_normal(16000) * 1000).astype(np.float32)
    got = np.asarray(fbank(wave))
    want = oracle_fbank(wave)
    assert got.shape == want.shape == (98, 80)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)


def test_fbank_short_input():
    assert num_frames(399) == 0
    out = np.asarray(fbank(np.zeros(399, np.float32)))
    assert out.shape == (0, 80)


def test_fbank_batch_lengths(rng):
    b = np.zeros((2, 16000), np.float32)
    w0 = (rng.standard_normal(16000) * 100).astype(np.float32)
    w1 = (rng.standard_normal(8000) * 100).astype(np.float32)
    b[0], b[1, :8000] = w0, w1
    feats, lens = fbank_batch(b, np.array([16000, 8000]))
    assert feats.shape[0] == 2
    assert list(np.asarray(lens)) == [98, 48]
    # row 1's valid frames must equal standalone extraction
    solo = np.asarray(fbank(w1))
    np.testing.assert_allclose(np.asarray(feats)[1, :48], solo, rtol=1e-4, atol=1e-4)


def test_dither_training_path():
    """dither applies only when a PRNG key is given (training); inference path
    stays deterministic (reference wav_frontend.py:120, dither=1.0 in train)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from funasr_tpu.frontends.wav_frontend import WavFrontend

    fe = WavFrontend(fs=16000, lfr_m=7, lfr_n=6, n_mels=80, dither=1.0)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32)
    lens = jnp.asarray([8000, 6000], jnp.int32)
    base, _ = fe._pipeline(wav, lens)
    base2, _ = fe._pipeline(wav, lens)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(base2))

    d1, _ = fe._pipeline(wav, lens, dither_rng=jax.random.PRNGKey(1))
    d2, _ = fe._pipeline(wav, lens, dither_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(d1), np.asarray(base))
    assert not np.allclose(np.asarray(d1), np.asarray(d2))
    # rows get independent noise
    delta = np.asarray(d1) - np.asarray(base)
    assert not np.allclose(delta[0], delta[1])
