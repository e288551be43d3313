"""RWKV/BAT, flash-attention integration, specialized datasets."""

import jax
import jax.numpy as jnp
import numpy as np


def test_rwkv_encoder_and_bat(rng):
    import funasr_tpu.models.rwkv_bat.model  # noqa: F401
    from funasr_tpu.register import tables
    enc = tables.encoder_classes["RWKVEncoder"](input_size=40, output_size=32,
                                                num_blocks=2)
    p = enc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 20, 40)), jnp.float32)
    out, lens = enc(p, x, jnp.asarray([20, 15]))
    assert out.shape == (2, 20, 32)
    # causality: truncating the input must not change earlier outputs
    out_short, _ = enc(p, x[:, :10], jnp.asarray([10, 10]))
    np.testing.assert_allclose(np.asarray(out[:, :10]), np.asarray(out_short),
                               rtol=1e-4, atol=1e-5)

    bat = tables.model_classes["BAT"](
        encoder="RWKVEncoder", encoder_conf=dict(output_size=32, num_blocks=2),
        decoder_conf=dict(embed_size=16, hidden_size=16),
        joint_network_conf=dict(joint_space_size=32), input_size=40, vocab_size=15)
    bp = bat.init_params(jax.random.PRNGKey(1))
    loss, _, _ = bat.forward_jit(
        bp, x, jnp.asarray([20, 15]),
        jnp.asarray(rng.integers(1, 15, (2, 3)), jnp.int32),
        jnp.asarray([3, 2]), jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_flash_fallback_on_cpu(rng):
    """On CPU the encoder must silently use the XLA path even at long T."""
    from funasr_tpu.models.sanm.encoder import SANMEncoder
    enc = SANMEncoder(input_size=64, output_size=128, attention_heads=1,
                      linear_units=64, num_blocks=1, kernel_size=5,
                      dropout_rate=0.0)
    p = enc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, 1024, 64)), jnp.float32)
    out, _ = enc(p, x, jnp.asarray([1024]))
    assert np.isfinite(np.asarray(out)).all()


def test_specialized_datasets(tmp_path, rng):
    import json
    import wave
    from funasr_tpu.datasets.specialized_datasets import (
        AudioDatasetHotword, SenseVoiceDataset)
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer
    TOK = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(20)] + ["<unk>"]
    wav_path = tmp_path / "a.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((rng.standard_normal(8000) * 3000).astype(np.int16).tobytes())
    line = {"source": str(wav_path), "target": "一丁丂七丄丅",
            "source_len": 8000, "target_len": 6}
    jf = tmp_path / "d.jsonl"
    jf.write_text(json.dumps(line, ensure_ascii=False) + "\n")
    tok = CharTokenizer(token_list=TOK)

    sv = SenseVoiceDataset(index_ds="IndexDSJsonl",
                           index_ds_conf={"path": str(jf)}, tokenizer=tok)
    item = sv[0]
    assert item["text_lengths"] == 10 and item["text"][3] == 15  # 4 tags prepended

    hw = AudioDatasetHotword(index_ds="IndexDSJsonl",
                             index_ds_conf={"path": str(jf)}, tokenizer=tok,
                             sample_rate=1.0)
    item = hw[0]
    assert "hotword" in item and 1 <= len(item["hotword"]) <= 8


def test_kws_streaming_and_llm_aliases():
    import funasr_tpu  # noqa: F401
    import funasr_tpu.models.llm_asr.model  # noqa: F401
    import funasr_tpu.models.fsmn_kws.model  # noqa: F401
    from funasr_tpu.register import tables
    for name in ("SanmKWSStreaming", "FsmnKWSMT", "Qwen3ASR", "LLMASR3", "MinMo",
                 "BAT", "RWKVBAT", "ConformerRWKV"):
        assert name in tables.model_classes, name
