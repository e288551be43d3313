"""End-to-end streaming ASR: 600 ms chunk loop through the full model + frontend."""

import jax
import numpy as np
import pytest


TOKENS = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(20)] + ["<unk>"]


@pytest.fixture(scope="module")
def stream_model():
    from funasr_tpu.models.paraformer_streaming.model import ParaformerStreaming
    model = ParaformerStreaming(
        input_size=560, vocab_size=len(TOKENS),
        encoder="SANMEncoderChunkOpt",
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, kernel_size=11, sanm_shfit=0,
                          dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                          att_layer_num=2, kernel_size=11, sanm_shfit=5),
        predictor_conf=dict(idim=16, l_order=1, r_order=1, tail_threshold=0.45),
        sos=1, eos=2, predictor_bias=1)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_streaming_chunks(stream_model):
    from funasr_tpu.frontends.wav_frontend import WavFrontendOnline
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer

    model, params = stream_model
    frontend = WavFrontendOnline(fs=16000, lfr_m=7, lfr_n=6, n_mels=80, dither=0.0)
    tok = CharTokenizer(token_list=list(TOKENS))

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)

    cache = {}
    stride = 9600  # 600 ms
    texts = []
    for i in range(0, len(wav), stride):
        chunk = wav[i: i + stride]
        res, _ = model.inference(params, chunk, key=["s"], tokenizer=tok,
                                 frontend=frontend, cache=cache,
                                 is_final=(i + stride >= len(wav)),
                                 chunk_size=[0, 10, 5],
                                 encoder_chunk_look_back=4,
                                 decoder_chunk_look_back=1)
        texts.append(res[0]["text"])
    assert isinstance(texts[-1], str)
    # cache resets after final: a second utterance works
    res2, _ = model.inference(params, wav[:16000], key=["s2"], tokenizer=tok,
                              frontend=frontend, cache=cache, is_final=True,
                              chunk_size=[0, 10, 5])
    assert "text" in res2[0]
