"""Whisper JAX model parity vs HF transformers (tiny random config)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_whisper():
    from transformers import WhisperConfig, WhisperForConditionalGeneration
    cfg = WhisperConfig(
        vocab_size=200, num_mel_bins=80, d_model=64, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, max_source_positions=100,
        max_target_positions=50, pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=[], begin_suppress_tokens=[])
    torch.manual_seed(0)
    return cfg, WhisperForConditionalGeneration(cfg).eval()


def test_whisper_logits_parity(tiny_whisper, rng):
    import jax.numpy as jnp
    from funasr_tpu.models.whisper.model import WhisperModel, convert_hf_whisper

    hf_cfg, hf = tiny_whisper
    model = WhisperModel(
        whisper_size="custom", vocab_size=200, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=100, max_target_positions=50)
    params = convert_hf_whisper(dict(hf.state_dict()), model)

    mel = rng.standard_normal((1, 200, 80)).astype(np.float32)
    tokens = rng.integers(0, 200, (1, 7)).astype(np.int64)
    with torch.no_grad():
        want = hf(input_features=torch.from_numpy(mel).transpose(1, 2),
                  decoder_input_ids=torch.from_numpy(tokens)).logits.numpy()
    enc, _ = model.encode(params, jnp.asarray(mel))
    got = np.asarray(model.decode_logits(params, jnp.asarray(tokens), enc))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_whisper_frontend_shapes():
    from funasr_tpu.frontends.whisper_frontend import WhisperFrontend
    fe = WhisperFrontend(n_mels=80, do_pad_trim=True, pad_samples=48000)
    wav = (np.random.default_rng(0).standard_normal(16000) * 0.1).astype(np.float32)
    feats, lens = fe.extract([wav])
    assert feats.shape == (1, 48000 // 160, 80)
    assert np.isfinite(feats).all()
    # whisper normalization keeps values in [-1, ~1+]
    assert feats.max() <= 1.5 and feats.min() >= -1.5


def test_whisper_registered():
    import funasr_tpu  # noqa: F401
    import funasr_tpu.models.whisper.model  # noqa: F401
    from funasr_tpu.register import tables
    assert "Whisper-large-v3" in tables.model_classes
    assert "whisper-tiny" in tables.model_classes


def test_cached_greedy_matches_prefix_oracle():
    """The kv-cached single-compile greedy decode (whisper greedy_decode)
    produces token-for-token the same output as the prefix-recompute oracle
    (_greedy_decode_prefix) across batches and early-EOT rows."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from funasr_tpu.models.whisper.model import WhisperModel

    m = WhisperModel(vocab_size=64, d_model=32, encoder_layers=2,
                     decoder_layers=2, encoder_attention_heads=4,
                     decoder_attention_heads=4, encoder_ffn_dim=64,
                     decoder_ffn_dim=64, max_source_positions=100,
                     max_target_positions=64, num_mel_bins=16)
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    for _ in range(3):
        mel = jnp.asarray(rng.standard_normal((2, 40, 16)), jnp.float32)
        enc, _ = m.encode(params, mel, jnp.asarray([40, 40]))
        cached = m.greedy_decode(params, enc, [1, 2], eot_id=3, max_new=8)
        oracle = m._greedy_decode_prefix(params, enc, [1, 2], eot_id=3,
                                         max_new=8)
        assert cached == oracle, (cached, oracle)
