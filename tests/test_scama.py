"""SCAMA: alignment/mask parity vs the reference functions, plus full-model
train step (grads through the chunked encoder + SCAMA-masked decoder) and
greedy inference."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

REF = "/root/reference"
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_scama_mask_parity_vs_reference(rng):
    torch = pytest.importorskip("torch")
    from funasr.models.scama.chunk_utilis import \
        build_scama_mask_for_cross_attention_decoder as ref_build

    from funasr_tpu.models.scama.utils import \
        build_scama_mask_for_cross_attention_decoder as my_build

    b, t_enc, k = 2, 24, 6
    align = np.zeros((b, t_enc), np.int32)
    for i in range(b):
        pos = rng.choice(t_enc, size=k, replace=False)
        align[i, pos] = 1
    enc_lens = np.array([24, 18], np.int32)
    tgt_lens = np.array([6, 4], np.int32)
    align[1, 18:] = 0
    enc_chunk = 6
    hop = rng.integers(0, 2, (t_enc,)).astype(np.float32)
    shift = np.ones((t_enc,), np.float32)

    want = ref_build(
        predictor_alignments=torch.from_numpy(align),
        encoder_sequence_length=torch.from_numpy(enc_lens),
        chunk_size=1, encoder_chunk_size=enc_chunk,
        attention_chunk_center_bias=0, attention_chunk_size=enc_chunk,
        attention_chunk_type="chunk", step=None,
        predictor_mask_chunk_hopping=torch.from_numpy(
            np.tile(hop[None, :, None], (b, 1, 1))),
        decoder_att_look_back_factor=1,
        mask_shift_att_chunk_decoder=torch.from_numpy(
            np.tile(shift[None, None, :], (b, 1, 1))),
        target_length=torch.from_numpy(tgt_lens), is_training=True).numpy()

    got = np.asarray(my_build(
        jnp.asarray(align), jnp.asarray(enc_lens), max_target_length=6,
        chunk_size=1, encoder_chunk_size=enc_chunk,
        attention_chunk_size=enc_chunk,
        predictor_mask_chunk_hopping=hop, decoder_att_look_back_factor=1,
        mask_shift_att_chunk_decoder=shift,
        target_length=jnp.asarray(tgt_lens), is_training=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_gen_frame_alignments_parity(rng):
    torch = pytest.importorskip("torch")
    from conftest import stub_reference_deps
    stub_reference_deps()
    from funasr.models.paraformer.cif_predictor import CifPredictorV2

    from funasr_tpu.models.scama.utils import gen_frame_alignments

    ref_pred = CifPredictorV2(8, 1, 1).eval()
    alphas = rng.random((2, 20)).astype(np.float32) * 0.6
    enc_lens = np.array([20, 15], np.int32)
    alphas[1, 15:] = 0
    with torch.no_grad():
        want, want_len = ref_pred.gen_frame_alignments(
            torch.from_numpy(alphas), torch.from_numpy(enc_lens))
    k = int(np.floor(alphas.sum(1)).max())
    got, got_len = gen_frame_alignments(jnp.asarray(alphas),
                                        jnp.asarray(enc_lens), k,
                                        training=False)
    np.testing.assert_array_equal(np.asarray(got), want.numpy())
    np.testing.assert_array_equal(np.asarray(got_len), want_len.numpy())


@pytest.fixture(scope="module")
def scama_model():
    from funasr_tpu.models.scama.model import SCAMA
    model = SCAMA(
        input_size=16, vocab_size=12,
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, kernel_size=5, chunk_size=(8,),
                          stride=(5,), pad_left=(0,),
                          encoder_att_look_back_factor=(1,),
                          decoder_att_look_back_factor=(1,)),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=3,
                          att_layer_num=2, kernel_size=5),
        predictor_conf=dict(idim=16, threshold=1.0, tail_threshold=0.45),
        ctc_weight=0.3, predictor_weight=1.0, lsm_weight=0.1)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_scama_train_step(scama_model, rng):
    model, params = scama_model
    speech = jnp.asarray(rng.standard_normal((2, 30, 16)), jnp.float32)
    slens = jnp.asarray([30, 22])
    text = jnp.asarray(rng.integers(3, 12, (2, 5)))
    tlens = jnp.asarray([5, 4])
    masks = model.overlap_chunk_cls.gen_chunk_mask(np.asarray([30, 22]), 0)

    def loss_fn(p):
        loss, stats, _ = model.forward_jit(p, speech, slens, text, tlens,
                                           masks=masks)
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for k in ("loss_att", "loss_ctc", "loss_pre", "acc"):
        assert np.isfinite(float(stats[k])), k
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0
    dec_g = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads["decoder"], 0.0)
    assert dec_g > 0


def test_scama_inference(scama_model, rng, tmp_path):
    import scipy.io.wavfile as wavfile

    from funasr_tpu.frontends.wav_frontend import WavFrontend
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer
    model, params = scama_model
    wav = (rng.standard_normal(8000) * 2000).astype(np.int16)
    path = str(tmp_path / "s.wav")
    wavfile.write(path, 16000, wav)
    frontend = WavFrontend(fs=16000, lfr_m=1, lfr_n=6, n_mels=16)
    tok = CharTokenizer(token_list=[f"t{i}" for i in range(11)] + ["<unk>"])
    res, _ = model.inference(params, [path], key=["u"], tokenizer=tok,
                             frontend=frontend)
    assert res[0]["key"] == "u" and isinstance(res[0]["text"], str)
