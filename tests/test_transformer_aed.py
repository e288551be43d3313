"""Transformer/Conformer AED: training loss + beam-search decode smoke."""

import jax
import numpy as np
import pytest

TOKENS = ["<blank>", "<s>", "</s>"] + [chr(ord("a") + i) for i in range(20)] + ["<unk>"]


@pytest.mark.parametrize("model_name", ["Transformer", "Conformer"])
def test_aed_forward_and_decode(model_name):
    import funasr_tpu  # registers
    from funasr_tpu.register import tables
    import funasr_tpu.models.conformer.model  # noqa: F401

    conf = dict(
        input_size=80, vocab_size=len(TOKENS), ctc_weight=0.3,
        encoder_conf=dict(output_size=32, attention_heads=2, linear_units=64,
                          num_blocks=2, input_layer="conv2d"),
        decoder_conf=dict(attention_heads=2, linear_units=64, num_blocks=2),
        sos=1, eos=2, lsm_weight=0.1)
    if model_name == "Conformer":
        conf["encoder_conf"]["cnn_module_kernel"] = 7
    model = tables.model_classes[model_name](**conf)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    speech = rng.standard_normal((2, 50, 80)).astype(np.float32)
    slens = np.array([50, 38])
    text = rng.integers(3, len(TOKENS), (2, 5)).astype(np.int32)
    tlens = np.array([5, 3])
    text = np.where(np.arange(5)[None] < tlens[:, None], text, -1)

    import jax.numpy as jnp
    loss, stats, _ = model.forward_jit(params, jnp.asarray(speech),
                                       jnp.asarray(slens), jnp.asarray(text),
                                       jnp.asarray(tlens), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # beam decode through the host inference path
    from funasr_tpu.frontends.wav_frontend import WavFrontend
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer
    frontend = WavFrontend(fs=16000, lfr_m=1, lfr_n=1, n_mels=80, dither=0.0)
    tok = CharTokenizer(token_list=list(TOKENS))
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    res, _ = model.inference(params, wav, tokenizer=tok, frontend=frontend,
                             beam_size=4, maxlenratio=0.2)
    assert "text" in res[0]
