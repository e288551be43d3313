"""KWS decode utils: CTC prefix-beam keyword detector (reference
funasr/utils/kws_utils.py semantics) + the prefix_beam inference path."""

import numpy as np


def _posteriors(seq, t_total, v, blank=0, hi=0.9):
    """Craft (T, V) posteriors emitting ``seq`` at spaced frames."""
    probs = np.full((t_total, v), (1 - hi) / (v - 1), np.float32)
    probs[:, blank] = hi
    for i, tok in enumerate(seq):
        t = 2 + i * 3
        probs[t] = (1 - hi) / (v - 1)
        probs[t, tok] = hi
    return probs


def test_split_and_query_tokens():
    from funasr_tpu.utils.kws_utils import query_token_set, split_mixed_label
    assert split_mixed_label("小爱hello同学") == ["小", "爱", "hello", "同", "学"]
    table = {"小": 3, "爱": 4, "hello": 5, "<unk>": 1, "<blank>": 0}
    strs, idxs = query_token_set("小爱", table)
    assert idxs == (3, 4)
    strs, idxs = query_token_set("hello", table)
    assert idxs == (5,)
    _, idxs = query_token_set("新", table)  # OOV -> <unk>
    assert idxs == (1,)


def test_prefix_decoder_detects_keyword():
    from funasr_tpu.utils.kws_utils import KwsCtcPrefixDecoder
    v = 10
    token_list = ["<blank>"] + [chr(ord("一") + i) for i in range(v - 1)]
    kw = token_list[3] + token_list[4] + token_list[5]
    dec = KwsCtcPrefixDecoder(keywords=kw, token_list=token_list)
    probs = _posteriors([3, 4, 5], 20, v)
    ok, word, score, span = dec.decode(probs)
    assert ok and word == kw
    assert 0.8 < score <= 1.0
    assert span == (2, 8)
    # absent keyword: no detection
    dec2 = KwsCtcPrefixDecoder(keywords=token_list[7] + token_list[8],
                               token_list=token_list)
    ok2, *_ = dec2.decode(probs)
    assert not ok2


def test_kws_inference_prefix_beam_path(rng):
    import jax

    from funasr_tpu.frontends.wav_frontend import WavFrontend
    from funasr_tpu.models.fsmn_kws.model import FsmnKWS
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer

    tokens = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i)
                                           for i in range(20)] + ["<unk>"]
    model = FsmnKWS(
        encoder="FSMN",
        encoder_conf=dict(input_dim=400, input_affine_dim=64, fsmn_layers=2,
                          linear_dim=64, proj_dim=32, lorder=10, rorder=0,
                          lstride=1, rstride=1, output_affine_dim=64,
                          output_dim=len(tokens), use_softmax=False),
        input_size=400, vocab_size=len(tokens))
    params = model.init_params(jax.random.PRNGKey(0))
    tok = CharTokenizer(token_list=list(tokens))
    frontend = WavFrontend(fs=16000, lfr_m=5, lfr_n=1, n_mels=80, dither=0.0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    res, _ = model.inference(params, wav, tokenizer=tok, frontend=frontend,
                             keywords="一丁,丂七丄", decode_mode="prefix_beam")
    # random weights: protocol shape only — at most one first-hit keyword
    assert len(res[0]["value"]) <= 1
    for hit in res[0]["value"]:
        assert set(hit) == {"keyword", "score", "frames"}
