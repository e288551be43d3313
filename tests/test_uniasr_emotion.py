"""UniASR 2-pass, emotion2vec, LLM-ASR variants."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

TOKENS = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(20)] + ["<unk>"]


def test_uniasr_two_pass():
    import jax.numpy as jnp
    from funasr_tpu.frontends.wav_frontend import WavFrontend
    from funasr_tpu.models.uniasr.model import UniASR
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer

    chunk = dict(chunk_size=(8,), stride=(5,), pad_left=(0,),
                 encoder_att_look_back_factor=(1,),
                 decoder_att_look_back_factor=(1,))
    model = UniASR(
        encoder="SANMEncoderChunkOpt",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, kernel_size=5, **chunk),
        encoder2="SANMEncoderChunkOpt",
        encoder2_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                           num_blocks=2, kernel_size=5, **chunk),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=3,
                          att_layer_num=2, kernel_size=5, sanm_shfit=0,
                          concat_embeds=True),
        decoder2_conf=dict(attention_heads=2, linear_units=32, num_blocks=3,
                           att_layer_num=2, kernel_size=5, sanm_shfit=0),
        predictor_conf=dict(idim=16), predictor2_conf=dict(idim=16),
        stride_conv_conf=dict(kernel_size=2, stride=2, pad=(0, 1)),
        input_size=560, vocab_size=len(TOKENS), sos=1, eos=2,
        predictor_bias=1, predictor2_bias=1)
    params = model.init_params(jax.random.PRNGKey(0))
    tok = CharTokenizer(token_list=list(TOKENS))
    frontend = WavFrontend(fs=16000, lfr_m=7, lfr_n=6, n_mels=80, dither=0.0)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    r_fast, _ = model.inference(params, wav, tokenizer=tok, frontend=frontend,
                                decoding_model="fast")
    r_norm, _ = model.inference(params, wav, tokenizer=tok, frontend=frontend,
                                decoding_model="normal")
    assert "text" in r_fast[0] and "text" in r_norm[0]

    feats, flens = frontend.extract([wav])
    text = jnp.asarray([[3, 4, 5, 6]], jnp.int32)
    loss, stats, _ = model.forward_jit(params, jnp.asarray(feats),
                                       jnp.asarray(flens), text,
                                       jnp.asarray([4]), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "loss_att2" in stats


def test_emotion2vec():
    from funasr_tpu.models.emotion2vec.model import Emotion2vec

    class Tok:  # labels come from the tokenizer, as in the reference
        token_list = [f"emo{i}" for i in range(9)]

    model = Emotion2vec(
        model_conf=dict(embed_dim=32, depth=2, num_heads=4, mlp_ratio=2.0,
                        modalities=dict(audio=dict(
                            prenet_depth=1, num_extra_tokens=2,
                            num_alibi_heads=4, conv_pos_depth=2,
                            conv_pos_groups=4,
                            feature_encoder_spec="[(16, 10, 5), (16, 3, 2)]"))),
        vocab_size=9)
    params = model.init_params(jax.random.PRNGKey(0))
    wav = (np.random.default_rng(0).standard_normal(16000) * 0.1).astype(np.float32)
    res, _ = model.inference(params, wav, granularity="utterance",
                             tokenizer=Tok())
    assert len(res[0]["labels"]) == 9
    assert abs(sum(res[0]["scores"]) - 1.0) < 1e-3
    assert res[0]["feats"].shape == (32,)
    res2, _ = model.inference(params, wav, granularity="frame",
                              tokenizer=Tok())
    assert res2[0]["feats"].ndim == 2


def test_llm_asr_variants_registered():
    import funasr_tpu  # noqa: F401
    import funasr_tpu.models.llm_asr.model  # noqa: F401
    from funasr_tpu.register import tables
    for name in ("LLMASR", "GLMASR", "QwenAudio", "LLMASRNAR", "UniASR", "SCAMA",
                 "Emotion2vec"):
        assert name in tables.model_classes, name
