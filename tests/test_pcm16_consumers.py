"""Raw-waveform consumers must be scale-correct for int16 PCM input.

``load_audio`` passes 1-D int16 ndarrays through unchanged (device-side
conversion saves half the upload bytes); every consumer that bypasses
``extract_fbank`` must normalize via ``as_unit_f32`` / ``as_pcm16_f32``.
Regression for the round-4 advisor finding: VAD / speaker / separation
models previously ran on 32768x-scaled audio when fed int16 ndarrays
(reference behavior: all paths take float [-1, 1) —
``/root/reference/funasr/utils/load_utils.py:75-100``).
"""

import jax
import numpy as np

from funasr_tpu.utils.load_utils import as_pcm16_f32, as_unit_f32, load_audio


def _pcm_pair(n=16000, seed=0):
    rng = np.random.default_rng(seed)
    i16 = (rng.standard_normal(n) * 3000).astype(np.int16)
    f32 = i16.astype(np.float32) / 32768.0
    return i16, f32


def test_scale_helpers_roundtrip():
    i16, f32 = _pcm_pair()
    np.testing.assert_array_equal(as_unit_f32(i16), f32)
    np.testing.assert_array_equal(as_pcm16_f32(i16), i16.astype(np.float32))
    np.testing.assert_allclose(as_pcm16_f32(f32), i16.astype(np.float32),
                               atol=1e-3)
    assert as_unit_f32(f32).dtype == np.float32
    # passthrough contract: 1-D int16 at target rate stays int16
    assert load_audio(i16).dtype == np.int16
    # but any resample/ndim path returns unit floats
    assert load_audio(i16, fs=8000, audio_fs=16000).dtype == np.float32


def test_campplus_int16_matches_float():
    from funasr_tpu.models.campplus.model import CAMPPlus

    i16, f32 = _pcm_pair(n=24000)
    model = CAMPPlus(feat_dim=80, embedding_size=192)
    params = model.init_params(jax.random.PRNGKey(0))
    emb_i = model.inference(params, [i16])[0][0]["spk_embedding"]
    emb_f = model.inference(params, [f32])[0][0]["spk_embedding"]
    np.testing.assert_allclose(np.asarray(emb_i), np.asarray(emb_f),
                               rtol=1e-4, atol=1e-4)
    assert float(np.abs(np.asarray(emb_f)).max()) > 0


def test_mossformer_int16_matches_float():
    from funasr_tpu.models.mossformer.model import MossFormer

    i16, f32 = _pcm_pair(n=8000)
    model = MossFormer(in_channels=64, out_channels=64, num_blocks=1,
                       kernel_size=16, num_spks=2)
    params = model.init_params(jax.random.PRNGKey(0))
    out_i = model.inference(params, [i16])[0][0]["value"]
    out_f = model.inference(params, [f32])[0][0]["value"]
    for a, b in zip(out_i, out_f):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_vad_streaming_int16_matches_float():
    from funasr_tpu.frontends.wav_frontend import WavFrontendOnline
    from funasr_tpu.models.fsmn_vad_streaming.model import FsmnVADStreaming

    enc_conf = dict(input_dim=400, input_affine_dim=140, fsmn_layers=2,
                    linear_dim=250, proj_dim=128, lorder=20, rorder=0,
                    lstride=1, rstride=1, output_affine_dim=140,
                    output_dim=248)
    model = FsmnVADStreaming(encoder="FSMN", encoder_conf=enc_conf)
    params = model.init_params(jax.random.PRNGKey(0))
    frontend = WavFrontendOnline(fs=16000, window="hamming", n_mels=80,
                                 frame_length=25, frame_shift=10,
                                 lfr_m=5, lfr_n=1, dither=0.0)

    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(48000) * 0.2).clip(-1, 1)
    wav[8000:24000] *= 4.0
    i16 = (wav * 32767).astype(np.int16)
    f32 = i16.astype(np.float32) / 32768.0

    def run(x):
        segs, _ = model.inference(params, x, frontend=frontend, cache={},
                                  is_final=True)
        return segs

    assert run(i16) == run(f32)
