"""Decode-time hotword biasing (bias-LM role of the reference C++ WFST
decoder): Aho-Corasick credit/rollback semantics + beam-search integration."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier


def _total(scorer, toks, v=10):
    node, total = scorer.init_state(), 0.0
    for t in toks:
        total += float(scorer.score_step(node, v)[t])
        node = scorer.advance(node, t)
    return total, node


def test_hotword_credit_and_rollback():
    from funasr_tpu.models.transformer.hotword_scorer import HotwordScorer
    sc = HotwordScorer([[1, 2, 3], [2, 4]], weight=2.0)

    # full match banks weight * len
    total, _ = _total(sc, [1, 2, 3])
    assert total == 2.0 * 3
    # dead partial match is net zero: credit for 1,2 then rollback on 7
    total, _ = _total(sc, [1, 2, 7])
    assert total == 0.0
    # Aho-Corasick fallback: 1,2,4 fails [1,2,3] but completes [2,4]
    total, _ = _total(sc, [1, 2, 4])
    assert total == 2.0 * 2  # net credit of the surviving [2, 4] match
    # back-to-back matches both bank credit
    total, _ = _total(sc, [1, 2, 3, 2, 4])
    assert total == 2.0 * 5
    # unrelated tokens never change the score
    total, _ = _total(sc, [7, 8, 9])
    assert total == 0.0


def test_hotword_beam_search_changes_onebest(rng):
    import jax.numpy as jnp

    from funasr_tpu.models.transformer.hotword_scorer import HotwordScorer
    from funasr_tpu.models.transformer.search import beam_search

    v = 8

    class StubDecoder:
        """Near-uniform scorer with a slight preference for token 5 and eos=2
        after 3 steps."""

        def score_step(self, params, ys, ylen, mem, mmask):
            n, lmax = ys.shape
            logp = np.full((n, v), np.log(1.0 / v), np.float32)
            logp[:, 5] += 0.4
            for i in range(n):
                if ylen[i] >= 4:
                    logp[i, 2] += 5.0
            return jnp.asarray(logp)

    mem = jnp.zeros((1, 4, 4))
    mmask = jnp.ones((1, 4), bool)
    base = beam_search(StubDecoder(), {}, mem, mmask, sos=1, eos=2,
                       beam_size=3, max_len=6)
    assert 5 in base[0].yseq  # unbiased 1-best picks the preferred token

    sc = HotwordScorer([[6, 7]], weight=2.0)
    biased = beam_search(StubDecoder(), {}, mem, mmask, sos=1, eos=2,
                         beam_size=3, max_len=6, hotword_scorer=sc)
    seq = biased[0].yseq
    assert any(seq[i] == 6 and seq[i + 1] == 7 for i in range(len(seq) - 1)), seq


def test_transformer_inference_accepts_hotword(rng, tmp_path):
    import scipy.io.wavfile as wavfile

    from funasr_tpu.frontends.wav_frontend import WavFrontend
    from funasr_tpu.models.transformer.model import Transformer
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer

    tokens = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i)
                                           for i in range(10)] + ["<unk>"]
    m = Transformer(input_size=560, vocab_size=len(tokens),
                    encoder_conf=dict(output_size=16, attention_heads=2,
                                      linear_units=32, num_blocks=1),
                    decoder_conf=dict(attention_heads=2, linear_units=32,
                                      num_blocks=1), ctc_weight=0.0)
    p = m.init_params(jax.random.PRNGKey(0))
    wav = (rng.standard_normal(8000) * 2000).astype(np.int16)
    path = str(tmp_path / "h.wav")
    wavfile.write(path, 16000, wav)
    fe = WavFrontend(fs=16000, lfr_m=7, lfr_n=6, n_mels=80, dither=0.0)
    tok = CharTokenizer(token_list=tokens)
    res, _ = m.inference(p, path, tokenizer=tok, frontend=fe, beam_size=2,
                         hotword="一丁 丂", hotword_weight=1.0)
    assert "text" in res[0]
