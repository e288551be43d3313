"""Chunked streaming conformer: offline chunk-masked == streaming chunks."""

import jax
import jax.numpy as jnp
import numpy as np


def test_chunk_conformer_stream_matches_offline(rng):
    import funasr_tpu  # noqa: F401
    from funasr_tpu.register import tables
    enc = tables.encoder_classes["ChunkConformerEncoder"](
        input_size=32, output_size=32, attention_heads=4, linear_units=64,
        num_blocks=2, cnn_module_kernel=7, chunk_size=8, left_chunks=2,
        input_layer="null")
    p = enc.init(jax.random.PRNGKey(0))
    b, t = 2, 32  # 4 chunks of 8
    x = jnp.asarray(rng.standard_normal((b, t, 32)), jnp.float32)
    full, _ = enc(p, x, jnp.asarray([t, t]))

    cache = enc.init_cache(b)
    outs = []
    for c in range(t // 8):
        y, cache = enc.forward_chunk(p, x[:, c * 8:(c + 1) * 8], cache)
        outs.append(y)
    stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                               rtol=2e-4, atol=2e-5)


def test_chunk_mask_blocks_future(rng):
    from funasr_tpu.models.conformer.encoder import chunk_attention_mask
    m = np.asarray(chunk_attention_mask(12, 4, 1))[0]
    assert m[0, 5] == False  # future chunk blocked  # noqa: E712
    assert m[5, 0] == True   # within left_chunks  # noqa: E712
    assert m[11, 0] == False  # beyond left_chunks  # noqa: E712


def test_streaming_transducer_matches_offline(rng):
    """Chunked transducer decode == offline greedy over chunk-causal encoder."""
    import funasr_tpu  # noqa: F401
    from funasr_tpu.register import tables
    model = tables.model_classes["Transducer"](
        encoder="ChunkConformerEncoder", input_size=32, vocab_size=12,
        encoder_conf=dict(output_size=32, attention_heads=4, linear_units=64,
                          num_blocks=2, cnn_module_kernel=7, chunk_size=8,
                          left_chunks=2, input_layer="null"),
        decoder_conf=dict(embed_size=16, hidden_size=16),
        joint_network_conf=dict(joint_space_size=32))
    p = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, 32, 32)), jnp.float32)

    enc_full, lens = model.encoder(p["encoder"], x, jnp.asarray([32]))
    offline = model.greedy_decode(p, enc_full, np.asarray([32]))[0]

    state = model.init_stream(p, batch=1)
    stream = []
    for c in range(4):
        toks, state = model.decode_chunk(p, x[:, c * 8:(c + 1) * 8], state)
        stream.extend(toks[0])
    assert stream == offline, (stream, offline)
