"""Transducer + language-model tests (RNN-T loss vs brute-force oracle)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier


def brute_force_rnnt(logp, targets, t_len, u_len, blank=0):
    """Enumerate all monotone alignments (tiny T,U only)."""
    from math import inf, log, exp

    # path = sequence of (emit|blank) decisions; enumerate via DP in python
    import functools

    @functools.lru_cache(maxsize=None)
    def ll(t, u):
        if t == t_len - 1 and u == u_len:
            return float(logp[t, u, blank])
        best = []
        if t < t_len - 1:
            best.append(float(logp[t, u, blank]) + ll(t + 1, u))
        if u < u_len:
            best.append(float(logp[t, u, targets[u]]) + ll(t, u + 1))
        if not best:
            return -inf
        m = max(best)
        return m + log(sum(exp(b - m) for b in best))

    return -ll(0, 0)


def test_rnnt_loss_matches_bruteforce(rng):
    from funasr_tpu.ops.rnnt_loss import rnnt_loss
    t, u, v = 4, 3, 5
    logits = rng.standard_normal((1, t, u + 1, v)).astype(np.float32)
    targets = rng.integers(1, v, (1, u)).astype(np.int32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))[0]
    want = brute_force_rnnt(logp, targets[0], t, u)
    got = float(rnnt_loss(jnp.asarray(logits), jnp.asarray(targets),
                          jnp.asarray([t]), jnp.asarray([u]))[0])
    assert abs(got - want) < 1e-4, (got, want)


def test_rnnt_loss_grad_finite(rng):
    from funasr_tpu.ops.rnnt_loss import rnnt_loss
    logits = jnp.asarray(rng.standard_normal((2, 6, 4, 8)), jnp.float32)
    targets = jnp.asarray(rng.integers(1, 8, (2, 3)), jnp.int32)

    def loss_fn(x):
        return jnp.mean(rnnt_loss(x, targets, jnp.asarray([6, 4]),
                                  jnp.asarray([3, 2])))

    g = jax.grad(loss_fn)(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_transducer_train_and_decode(rng):
    from funasr_tpu.models.transducer.model import Transducer
    model = Transducer(
        encoder="TransformerEncoder",
        encoder_conf=dict(output_size=32, attention_heads=2, linear_units=64,
                          num_blocks=2, input_layer="conv2d"),
        decoder_conf=dict(embed_size=16, hidden_size=16, num_layers=1),
        joint_network_conf=dict(joint_space_size=32),
        input_size=80, vocab_size=20)
    params = model.init_params(jax.random.PRNGKey(0))
    speech = jnp.asarray(rng.standard_normal((2, 40, 80)), jnp.float32)
    slens = jnp.asarray([40, 30])
    text = jnp.asarray(rng.integers(1, 20, (2, 4)), jnp.int32)
    tlens = jnp.asarray([4, 3])
    loss, stats, _ = model.forward_jit(params, speech, slens, text, tlens,
                                       jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    enc, enc_lens = model.encoder(params["encoder"], speech, slens)
    hyps = model.greedy_decode(params, enc, np.asarray(enc_lens))
    assert len(hyps) == 2


def test_transformer_lm_scores(rng):
    from funasr_tpu.models.language_model.transformer_lm import SeqRNNLM, TransformerLM
    for cls in (TransformerLM, SeqRNNLM):
        lm = cls(vocab_size=30)
        params = lm.init_params(jax.random.PRNGKey(0))
        text = jnp.asarray(rng.integers(1, 30, (2, 6)), jnp.int32)
        loss, stats, _ = lm.forward_jit(params, text, jnp.asarray([6, 4]))
        assert np.isfinite(float(loss)) and float(stats["ppl"]) > 0
        scores = lm.score_step(params, text, jnp.asarray([6, 4]))
        assert scores.shape == (2, 30)
        np.testing.assert_allclose(np.asarray(jnp.exp(scores)).sum(-1),
                                   np.ones(2), rtol=1e-4)


def test_transducer_jitted_greedy_matches_host_oracle():
    """The single-program lax.scan greedy decode equals the per-frame host
    loop token-for-token (incl. rows with different lengths/blank patterns)."""
    import jax
    import numpy as np

    from funasr_tpu.models.transducer.model import Transducer

    model = Transducer(encoder="ConformerEncoder",
                       encoder_conf=dict(output_size=32, attention_heads=4,
                                         linear_units=64, num_blocks=2,
                                         input_layer="null"),
                       decoder_conf=dict(embed_size=16, hidden_size=16),
                       joint_network_conf=dict(joint_space_size=32),
                       input_size=32, vocab_size=11)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    enc, enc_lens = model.encoder(params["encoder"],
                                  rng.standard_normal((3, 20, 32)).astype("f"),
                                  np.asarray([20, 14, 9]))
    fast = model.greedy_decode(params, enc, np.asarray([20, 14, 9]))
    slow = model._greedy_decode_host(params, enc, np.asarray([20, 14, 9]))
    assert fast == slow, (fast, slow)
