"""Streaming-model training with overlap-chunk masks (reference
funasr/models/scama/chunk_utilis.py + paraformer_streaming/model.py:107-111)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier


def test_overlap_chunk_masks_roundtrip():
    """split_chunk -> remove_chunk is the identity on the valid region, and the
    attention mask matches own-chunk + look-back semantics."""
    from funasr_tpu.models.scama.chunk_utils import OverlapChunk

    oc = OverlapChunk(chunk_size=(12,), stride=(8,), pad_left=(0,),
                      encoder_att_look_back_factor=(2,), shfit_fsmn=5)
    lens = np.asarray([40, 29])
    masks = oc.gen_chunk_mask(lens, 0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 40, 4)), jnp.float32)
    xc, lens_c = OverlapChunk.split_chunk(x, lens, masks)
    assert int(np.asarray(lens_c).max()) == xc.shape[1] == \
        masks["x_add_mask"].shape[0]
    back = OverlapChunk.remove_chunk(xc, lens_c, masks)
    for b, n in enumerate(lens):
        np.testing.assert_allclose(np.asarray(back)[b, :n],
                                   np.asarray(x)[b, :n], rtol=1e-6, atol=1e-6)

    att = masks["mask_att_chunk_encoder"]
    shift = 12 + 5
    # fsmn-pad rows/cols never attend
    assert not att[:5].any() and not att[:, :5].any()
    # chunk 1 frame rows see all of chunk 1's frames
    assert att[shift + 5 + 3, shift + 5 + 11]
    # chunk 1 stride-region query sees chunk 0 stride rows (look-back)
    assert att[shift + 5 + 0, 5 + 0]
    # but NOT chunk 0's lookahead region (j >= stride)
    assert not att[shift + 5 + 0, 5 + 9]
    # chunk 2 must not see chunk 0 beyond the look-back horizon of 2 -> sees it
    oc1 = OverlapChunk(chunk_size=(12,), stride=(8,), pad_left=(0,),
                       encoder_att_look_back_factor=(1,), shfit_fsmn=5)
    att1 = oc1.gen_chunk_mask(lens, 0)["mask_att_chunk_encoder"]
    if att1.shape[0] > 2 * shift + 5:
        assert not att1[2 * shift + 5 + 0, 5 + 0], \
            "look-back 1 must not reach 2 chunks back"


def _build_streaming():
    from funasr_tpu.models.paraformer_streaming.model import ParaformerStreaming

    return ParaformerStreaming(
        input_size=24, vocab_size=30, specaug=None,
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, kernel_size=11, sanm_shfit=0,
                          dropout_rate=0.0, chunk_size=[12, 15], stride=[8, 10],
                          pad_left=[0, 0], encoder_att_look_back_factor=[4, 4],
                          decoder_att_look_back_factor=[1, 1]),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                          att_layer_num=2, kernel_size=11, sanm_shfit=0),
        predictor_conf=dict(idim=16, l_order=1, r_order=1, tail_threshold=0.45),
        sos=1, eos=2, predictor_bias=1, sampling_ratio=0.0)


def test_streaming_forward_jit_trains():
    """forward_jit with randomly sampled chunk configs [12,15]: finite loss,
    grads flow to every param group, and different rng seeds pick different
    chunk configs inside ONE jitted program."""
    model = _build_streaming()
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 37, 24)), jnp.float32)
    slens = jnp.asarray([37, 25], jnp.int32)
    text = jnp.asarray(rng.integers(3, 30, (2, 5)), jnp.int32)
    tlens = jnp.asarray([5, 3], jnp.int32)
    text = jnp.where(jnp.arange(5)[None] < tlens[:, None], text, -1)

    @jax.jit
    def loss_fn(p, k):
        loss, stats, w = model.forward_jit(p, speech, slens, text, tlens, k)
        return loss, stats

    grad_fn = jax.jit(jax.value_and_grad(lambda p, k: loss_fn(p, k)[0]))
    losses = []
    for seed in range(4):
        loss, grads = grad_fn(params, jax.random.PRNGKey(seed))
        assert np.isfinite(float(loss)), f"seed {seed}: loss {loss}"
        gnorms = {k: float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in
                                        jax.tree_util.tree_leaves(v))))
                  for k, v in grads.items()}
        for group, gn in gnorms.items():
            assert np.isfinite(gn) and gn > 0, f"seed {seed}: {group} grad {gn}"
        losses.append(float(loss))
    # the two chunk configs give different chunked layouts -> at least two
    # distinct loss values across seeds
    assert len(set(np.round(losses, 6))) >= 2, losses


def test_streaming_chunk_loss_close_to_offline():
    """With look-back 1e6 (effectively unlimited) the chunk-masked loss should
    be in the same ballpark as the plain offline forward (sanity on mask math:
    chunked attention with full look-back over stride rows still differs by the
    duplicated context, but must stay finite and comparable)."""
    model = _build_streaming()
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    speech = jnp.asarray(rng.standard_normal((1, 32, 24)), jnp.float32)
    slens = jnp.asarray([32], jnp.int32)
    text = jnp.asarray(rng.integers(3, 30, (1, 4)), jnp.int32)
    tlens = jnp.asarray([4], jnp.int32)

    from funasr_tpu.models.paraformer.model import Paraformer
    loss_c, _, _ = model.forward_jit(params, speech, slens, text, tlens,
                                     jax.random.PRNGKey(0))
    loss_o, _, _ = Paraformer.forward_jit(model, params, speech, slens, text,
                                          tlens, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss_c)) and np.isfinite(float(loss_o))
    assert abs(float(loss_c) - float(loss_o)) < 0.5 * max(float(loss_o), 1.0)
