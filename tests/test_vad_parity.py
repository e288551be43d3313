"""FSMN-VAD parity vs the reference torch implementation.

Feeds identical features + waveform to both state machines (bypassing the
torchaudio-dependent reference frontend) and compares emitted segments ms-exactly.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")]
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

# stub reference-only deps so its model modules import (we only drive the state machine)
import types  # noqa: E402

from conftest import stub_reference_deps  # noqa: E402

stub_reference_deps()

ENC_CONF = dict(input_dim=400, input_affine_dim=140, fsmn_layers=4, linear_dim=250,
                proj_dim=128, lorder=20, rorder=0, lstride=1, rstride=1,
                output_affine_dim=140, output_dim=248)


def _make_pair():
    torch.manual_seed(3)
    from funasr.models.fsmn_vad_streaming.model import FsmnVADStreaming as RefVad
    from funasr_tpu.convert.torch_to_jax import convert_fsmn_vad
    from funasr_tpu.models.fsmn_vad_streaming.model import FsmnVADStreaming

    ref = RefVad(encoder="FSMN", encoder_conf=dict(ENC_CONF)).eval()
    mine = FsmnVADStreaming(encoder="FSMN", encoder_conf=dict(ENC_CONF))
    params = convert_fsmn_vad(dict(ref.state_dict()), mine)
    return ref, mine, params


def _synth(seconds=6.0, fs=16000, seed=0):
    """Loud tone bursts separated by near-silence."""
    rng = np.random.default_rng(seed)
    n = int(seconds * fs)
    wav = rng.standard_normal(n).astype(np.float32) * 3e-4
    for beg, end in [(0.5, 1.8), (3.0, 4.6)]:
        i, j = int(beg * fs), int(end * fs)
        t = np.arange(j - i) / fs
        wav[i:j] += (0.3 * np.sin(2 * np.pi * 220 * t)
                     + 0.2 * np.sin(2 * np.pi * 570 * t)).astype(np.float32)
    return wav


def _feats_and_waveform(wav):
    """VAD features: fbank (dither 0) + LFR(5,1), plus aligned scaled waveform."""
    import jax.numpy as jnp
    from funasr_tpu.ops.fbank import fbank
    from funasr_tpu.ops.lfr import apply_lfr

    mel = np.asarray(fbank(jnp.asarray(wav * 32768.0)))
    feats = np.asarray(apply_lfr(jnp.asarray(mel), 5, 1))
    t = feats.shape[0]
    aligned = wav[: (t - 1) * 160 + 400] * 32768.0
    return feats[None].astype(np.float32), aligned


def _run_reference(ref, feats, waveform, chunks=1):
    cache = {}
    ref.init_cache(cache)
    t = feats.shape[1]
    step = -(-t // chunks)
    segs = []
    for c in range(chunks):
        beg, end = c * step, min((c + 1) * step, t)
        if beg >= end:
            break
        w_beg = beg * 160
        w_end = (end - 1) * 160 + 400
        out = ref.forward(
            feats=torch.from_numpy(feats[:, beg:end]),
            waveform=torch.from_numpy(waveform[None, w_beg:w_end]),
            cache=cache, is_final=(end == t), is_streaming_input=False)
        for batch in out:
            segs.extend(batch)
    return segs


def _run_mine(mine, params, feats, waveform, chunks=1):
    cache = mine.init_cache({})
    t = feats.shape[1]
    step = -(-t // chunks)
    segs = []
    for c in range(chunks):
        beg, end = c * step, min((c + 1) * step, t)
        if beg >= end:
            break
        w_beg = beg * 160
        w_end = (end - 1) * 160 + 400
        out = mine.forward(params, feats[:, beg:end], waveform[w_beg:w_end],
                           cache, is_final=(end == t), is_streaming_input=False)
        if out:
            segs.extend(out[0])
    return segs


def test_vad_segments_match_reference():
    ref, mine, params = _make_pair()
    wav = _synth()
    feats, waveform = _feats_and_waveform(wav)
    want = _run_reference(ref, feats, waveform)
    got = _run_mine(mine, params, feats, waveform)
    assert got == want
    assert len(got) >= 1  # the bursts must be detected


def test_vad_chunked_matches_offline():
    ref, mine, params = _make_pair()
    wav = _synth(seconds=8.0, seed=1)
    feats, waveform = _feats_and_waveform(wav)
    want = _run_reference(ref, feats, waveform, chunks=5)
    got = _run_mine(mine, params, feats, waveform, chunks=5)
    assert got == want
