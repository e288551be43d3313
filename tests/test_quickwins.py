"""LoRA, cr-CTC, extra tokenizers, train utils, Branchformer."""

import jax
import jax.numpy as jnp
import numpy as np


def test_lora_inject_filter_merge():
    from funasr_tpu.core.layers import linear_apply, linear_init
    from funasr_tpu.models.lora.layers import (
        inject_lora, lora_linear_apply, lora_param_filter, merge_lora)
    rng = jax.random.PRNGKey(0)
    params = {"attn": {"linear_q_k_v": linear_init(rng, 8, 24),
                       "other": linear_init(rng, 8, 8)}}
    lp = inject_lora(params, rng, targets=("linear_q_k_v",), r=4)
    assert "lora_a" in lp["attn"]["linear_q_k_v"]
    assert "lora_a" not in lp["attn"]["other"]
    mask = lora_param_filter(lp)
    assert mask["attn"]["linear_q_k_v"]["lora_a"] is True
    assert mask["attn"]["linear_q_k_v"]["w"] is False
    x = jnp.ones((2, 8))
    y = lora_linear_apply(lp["attn"]["linear_q_k_v"], lp["attn"]["linear_q_k_v"],
                          x, r=4)
    # freshly injected lora_b is zero -> identical to base
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(linear_apply(params["attn"]["linear_q_k_v"], x)),
                               rtol=1e-6)
    merged = merge_lora(lp, r=4)
    assert "lora_a" not in merged["attn"]["linear_q_k_v"]


def test_cr_ctc(rng):
    from funasr_tpu.losses.cr_ctc import cr_ctc_loss
    la = jnp.asarray(rng.standard_normal((2, 10, 8)), jnp.float32)
    lb = la + 0.01
    labels = jnp.asarray(rng.integers(1, 8, (2, 3)), jnp.int32)
    loss = cr_ctc_loss(la, lb, jnp.asarray([10, 7]), labels, jnp.asarray([3, 2]))
    assert np.isfinite(float(loss))
    # identical views -> consistency term ~0; differing views -> larger loss
    loss_same = cr_ctc_loss(la, la, jnp.asarray([10, 7]), labels,
                            jnp.asarray([3, 2]))
    assert float(loss) >= float(loss_same) - 1e-6


def test_extra_tokenizers(tmp_path):
    from funasr_tpu.tokenizer.extra_tokenizers import (
        PhonemeTokenizer, TokenIDConverter, WordTokenizer, basic_cleaner)
    wt = WordTokenizer(token_list=["<unk>", "hello", "world"])
    assert wt.encode("hello world") == [1, 2]
    lex = tmp_path / "lex.txt"
    lex.write_text("hello HH EH L OW\n")
    pt = PhonemeTokenizer(lexicon_file=str(lex))
    assert pt.text2tokens("hello hi") == ["HH", "EH", "L", "OW", "h", "i"]
    conv = TokenIDConverter(["<unk>", "a", "b"])
    assert conv.tokens2ids(["a", "zzz"]) == [1, 0]
    assert basic_cleaner("  a   b ") == "a b"


def test_train_utils_misc(tmp_path):
    from funasr_tpu.train_utils.misc import (add_gradient_noise, model_summary,
                                             set_all_random_seed)
    key = set_all_random_seed(5)
    params = {"enc": {"w": jnp.ones((10, 10))}, "dec": {"w": jnp.ones((5,))}}
    summary = model_summary(params)
    assert "TOTAL" in summary and "0.00 M" in summary
    grads = {"w": jnp.zeros((4, 4))}
    noisy = add_gradient_noise(grads, key, step=0, eta=1.0)
    assert float(jnp.abs(noisy["w"]).sum()) > 0


def test_branchformer_models(rng):
    import funasr_tpu  # noqa: F401
    import funasr_tpu.models.branchformer.encoder  # noqa: F401
    from funasr_tpu.register import tables
    for name in ("Branchformer", "EBranchformer"):
        model = tables.model_classes[name](
            input_size=80, vocab_size=20, ctc_weight=0.3,
            encoder_conf=dict(output_size=32, attention_heads=2,
                              cgmlp_linear_units=64, cgmlp_conv_kernel=7,
                              num_blocks=2, ffn_units=32),
            decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2))
        params = model.init_params(jax.random.PRNGKey(0))
        speech = jnp.asarray(rng.standard_normal((2, 40, 80)), jnp.float32)
        loss, _, _ = model.forward_jit(params, speech, jnp.asarray([40, 30]),
                                       jnp.asarray(rng.integers(3, 20, (2, 4)),
                                                   jnp.int32),
                                       jnp.asarray([4, 3]), jax.random.PRNGKey(1))
        assert np.isfinite(float(loss)), name
