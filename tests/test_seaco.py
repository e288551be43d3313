"""SeACo-Paraformer hotword biasing: end-to-end smoke + bias-encoder behavior."""

import jax
import numpy as np
import pytest

TOKENS = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(20)] + ["<unk>"]


@pytest.fixture(scope="module")
def seaco_model():
    from funasr_tpu.models.seaco_paraformer.model import SeacoParaformer
    model = SeacoParaformer(
        input_size=560, vocab_size=len(TOKENS),
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, kernel_size=5, dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                          att_layer_num=2, kernel_size=5, sanm_shfit=0),
        predictor_conf=dict(idim=16, l_order=1, r_order=1, tail_threshold=0.45,
                            upsample_times=3, upsample_type="cnn_blstm",
                            use_cif1_cnn=False),
        seaco_decoder="ParaformerSANMDecoder",
        seaco_decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                                att_layer_num=2, kernel_size=5, sanm_shfit=0,
                                use_output_layer=False),
        inner_dim=16, NO_BIAS=len(TOKENS) - 1,
        sos=1, eos=2, predictor_bias=1)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_seaco_inference_with_hotwords(seaco_model):
    from funasr_tpu.frontends.wav_frontend import WavFrontend
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer

    model, params = seaco_model
    frontend = WavFrontend(fs=16000, lfr_m=7, lfr_n=6, n_mels=80, dither=0.0)
    tok = CharTokenizer(token_list=list(TOKENS))
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    res_plain, _ = model.inference(params, wav, tokenizer=tok, frontend=frontend)
    res_hw, _ = model.inference(params, wav, tokenizer=tok, frontend=frontend,
                                hotword="一丁 丂七")
    assert "text" in res_plain[0] and "text" in res_hw[0]
    assert "timestamp" in res_hw[0]


def test_hotword_representation_shape(seaco_model):
    import jax.numpy as jnp
    model, params = seaco_model
    hw_pad = jnp.asarray([[3, 4, 0], [5, 0, 0], [1, 0, 0]], jnp.int32)
    hw_lens = jnp.asarray([2, 1, 1], jnp.int32)
    rep = model._hotword_representation(params, hw_pad, hw_lens)
    assert rep.shape == (3, 16)
    # different lengths should pick different LSTM steps
    rep2 = model._hotword_representation(params, hw_pad, jnp.asarray([1, 1, 1]))
    assert not np.allclose(np.asarray(rep)[0], np.asarray(rep2)[0])
