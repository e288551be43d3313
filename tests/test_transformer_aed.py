"""Transformer/Conformer AED: training loss + beam-search decode smoke."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

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


def test_lm_shallow_fusion_changes_onebest():
    """beam_search combines am + lm_weight*lm per step (reference weighted-
    scorer semantics); a biased LM flips the 1-best; weight 0 is a no-op."""
    import jax
    import jax.numpy as jnp
    import funasr_tpu  # registers
    from funasr_tpu.register import tables
    from funasr_tpu.core.layers import make_pad_mask
    from funasr_tpu.models.transformer.search import beam_search

    conf = dict(
        input_size=80, vocab_size=len(TOKENS), ctc_weight=0.0,
        encoder_conf=dict(output_size=32, attention_heads=2, linear_units=64,
                          num_blocks=2, input_layer="conv2d"),
        decoder_conf=dict(attention_heads=2, linear_units=64, num_blocks=2),
        sos=1, eos=2)
    model = tables.model_classes["Transformer"](**conf)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    speech = rng.standard_normal((1, 50, 80)).astype(np.float32)
    enc, enc_lens = model.encode(params, jnp.asarray(speech),
                                 jnp.asarray([50]))
    mmask = make_pad_mask(enc_lens, enc.shape[1])

    base = beam_search(model.decoder, params["decoder"], enc, mmask, 1, 2,
                       beam_size=4, max_len=4)

    class BiasLM:
        """Deterministic LM pushing everything toward token `fav`."""
        def __init__(self, fav, vocab):
            self.fav = fav
            self.vocab = vocab

        def score_step(self, lm_params, ys, ys_len):
            n = np.asarray(ys).shape[0]
            logp = np.full((n, self.vocab), -10.0, np.float32)
            logp[:, self.fav] = 0.0
            return logp

    # favourite token != current 1-best next token
    fav = (base[0].yseq[1] + 1) % len(TOKENS)
    if fav in (1, 2):
        fav = 5
    fused = beam_search(model.decoder, params["decoder"], enc, mmask, 1, 2,
                        beam_size=4, max_len=4, lm=BiasLM(fav, len(TOKENS)),
                        lm_params=None, lm_weight=100.0)
    assert fused[0].yseq[1] == fav, (fused[0].yseq, base[0].yseq)

    noop = beam_search(model.decoder, params["decoder"], enc, mmask, 1, 2,
                       beam_size=4, max_len=4, lm=BiasLM(fav, len(TOKENS)),
                       lm_params=None, lm_weight=0.0)
    assert noop[0].yseq == base[0].yseq

    # real TransformerLM plugs in through the same interface
    lm = tables.model_classes["TransformerLM"](vocab_size=len(TOKENS),
                                               embed_unit=16, att_unit=32,
                                               head=2, unit=64, layer=2)
    lm_params = lm.init_params(jax.random.PRNGKey(2))
    fused2 = beam_search(model.decoder, params["decoder"], enc, mmask, 1, 2,
                         beam_size=4, max_len=4, lm=lm, lm_params=lm_params,
                         lm_weight=0.5)
    assert fused2 and np.isfinite(fused2[0].score)

    # brute-force exhaustive check: beam covering the whole vocab at depth 2
    # must find the argmax of the combined score
    V = len(TOKENS)
    full = beam_search(model.decoder, params["decoder"], enc, mmask, 1, 2,
                       beam_size=V, max_len=2, lm=lm, lm_params=lm_params,
                       lm_weight=0.5)
    ys = np.full((V, 8), 0, np.int32)
    ys[:, 0] = 1
    am = np.asarray(model.decoder.score_step(
        params["decoder"], jnp.asarray(ys[:1]), jnp.asarray([1]), enc, mmask))[0]
    lmp = np.asarray(lm.score_step(lm_params, jnp.asarray(ys[:1]),
                                   jnp.asarray([1])))[0]
    combined = am + 0.5 * lmp
    best_first = int(np.argmax(combined))
    assert full[0].yseq[1] == best_first
