"""Golden tests for LFR stacking and CIF against sequential/naive oracles."""

import numpy as np

from funasr_tpu.ops.cif import cif, cif_fires
from funasr_tpu.ops.lfr import apply_lfr, apply_lfr_batch


def oracle_lfr(x, m, n):
    """Reference apply_lfr semantics (wav_frontend.py:63-86) as explicit python."""
    t = x.shape[0]
    t_lfr = int(np.ceil(t / n))
    padded = np.concatenate([np.repeat(x[:1], (m - 1) // 2, axis=0), x], axis=0)
    rows = []
    for i in range(t_lfr):
        idx = [min(i * n + j, padded.shape[0] - 1) for j in range(m)]
        rows.append(padded[idx].reshape(-1))
    return np.stack(rows)


def test_lfr_matches_oracle(rng):
    x = rng.standard_normal((50, 4)).astype(np.float32)
    for m, n in [(7, 6), (5, 1), (1, 1), (3, 2)]:
        got = np.asarray(apply_lfr(x, m, n))
        want = oracle_lfr(x, m, n)
        np.testing.assert_allclose(got, want, rtol=1e-6, err_msg=f"m={m} n={n}")


def test_lfr_batch_matches_single(rng):
    b = np.zeros((2, 50, 4), np.float32)
    b[0] = rng.standard_normal((50, 4))
    b[1, :31] = rng.standard_normal((31, 4))
    out, lens = apply_lfr_batch(b, np.array([50, 31]), 7, 6)
    out = np.asarray(out)
    assert list(np.asarray(lens)) == [int(np.ceil(50 / 6)), int(np.ceil(31 / 6))]
    np.testing.assert_allclose(out[0], oracle_lfr(b[0], 7, 6), rtol=1e-6)
    np.testing.assert_allclose(out[1, : lens[1]], oracle_lfr(b[1, :31], 7, 6), rtol=1e-6)


def oracle_cif(hidden, alphas, threshold=1.0):
    """Sequential per-frame CIF (reference ``cif`` at cif_predictor.py:768-815)."""
    b, t, d = hidden.shape
    integrate = np.zeros(b)
    frame = np.zeros((b, d))
    fires = np.zeros((b, t))
    frames_at_fire = [[] for _ in range(b)]
    for i in range(t):
        alpha = alphas[:, i]
        dist_completion = threshold - integrate
        integrate = integrate + alpha
        fires[:, i] = integrate
        fire = integrate >= threshold
        cur = np.where(fire, dist_completion, alpha)
        remains = alpha - cur
        frame = frame + cur[:, None] * hidden[:, i]
        for bb in range(b):
            if fire[bb]:
                frames_at_fire[bb].append(frame[bb].copy())
        frame = np.where(fire[:, None], remains[:, None] * hidden[:, i], frame)
        integrate = np.where(fire, integrate - threshold, integrate)
    max_tok = max((len(f) for f in frames_at_fire), default=0)
    out = np.zeros((b, max_tok, d))
    for bb in range(b):
        for k, fr in enumerate(frames_at_fire[bb]):
            out[bb, k] = fr
    return out, fires


def test_cif_matches_sequential(rng):
    b, t, d = 3, 40, 8
    hidden = rng.standard_normal((b, t, d)).astype(np.float32)
    alphas = rng.uniform(0, 0.9, (b, t)).astype(np.float32)
    want_frames, want_fires = oracle_cif(hidden, alphas)
    k = want_frames.shape[1] + 2
    got_frames, got_fires = cif(hidden, alphas, max_tokens=k)
    got_frames = np.asarray(got_frames)
    np.testing.assert_allclose(got_frames[:, : want_frames.shape[1]], want_frames,
                               rtol=1e-4, atol=1e-5)
    # fires convention: >=1 at fire positions, fractional elsewhere
    fire_pos_want = want_fires >= 1.0
    fires2, fire_mask, _ = cif_fires(alphas)
    np.testing.assert_array_equal(np.asarray(fire_mask), fire_pos_want)


def test_cif_no_fire():
    hidden = np.ones((1, 10, 4), np.float32)
    alphas = np.full((1, 10), 0.01, np.float32)
    frames, fires = cif(hidden, alphas, max_tokens=4)
    assert np.allclose(np.asarray(frames), 0.0)
