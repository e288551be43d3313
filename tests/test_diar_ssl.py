"""EEND-OLA diarization + data2vec SSL tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier


def test_eend_ola_train_and_infer(rng):
    from funasr_tpu.models.eend.model import DiarEENDOLA
    model = DiarEENDOLA(
        encoder_conf=dict(output_size=32, attention_heads=2, linear_units=64,
                          num_blocks=2, input_layer="linear"),
        input_size=23, n_units=32, max_n_speaker=3, frame_shift_ms=100)
    params = model.init_params(jax.random.PRNGKey(0))

    speech = jnp.asarray(rng.standard_normal((2, 40, 23)), jnp.float32)
    slens = jnp.asarray([40, 30])
    labels = jnp.asarray(rng.integers(0, 2, (2, 40, 2)), jnp.float32)
    loss, stats, _ = model.forward_jit(params, speech, slens, labels,
                                       jnp.asarray([40, 30]))
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.forward_jit(p, speech, slens, labels,
                                             jnp.asarray([40, 30]))[0])(params)
    assert np.isfinite(sum(float(jnp.sum(jnp.square(x)))
                           for x in jax.tree_util.tree_leaves(g)))

    # inference via a simple frontend facade
    class FE:
        fs = 8000
        frame_shift_ms = 10
        lfr_n = 1

        def extract(self, wavs):
            feats = [np.asarray(rng.standard_normal((50, 23)), np.float32)
                     for _ in wavs]
            lens = np.asarray([f.shape[0] for f in feats], np.int32)
            return np.stack(feats), lens

    res, _ = model.inference(params, np.zeros(8000, np.float32), frontend=FE())
    assert "n_speakers" in res[0] and isinstance(res[0]["value"], list)
    for seg in res[0]["value"]:
        assert seg[1] < seg[2]


def test_data2vec_ssl(rng):
    from funasr_tpu.models.data2vec.model import Data2VecPretrainModel
    # raw-waveform config: wav2vec2-style 1-d conv front over samples
    model = Data2VecPretrainModel(encoder_conf=dict(
        input_size=1, conv_feature_layers="[(32,10,5)] + [(32,3,2)] * 2",
        encoder_layers=2, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=4, conv_pos=4, conv_pos_groups=2,
        average_top_k_layers=2, instance_norm_target_layer=True,
        mask_prob=0.5, mask_length=3, ema_decay=0.9, ema_end_decay=0.99))
    params = model.init_params(jax.random.PRNGKey(0))
    wav = jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32)
    loss, stats, _ = model.forward_jit(params, wav, jnp.asarray([8000, 6000]),
                                       rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and float(stats["masked_frames"]) > 0
    # EMA moves teacher toward student
    params["student"]["encoder"]["layer_norm"]["scale"] = \
        params["student"]["encoder"]["layer_norm"]["scale"] + 1.0
    before = np.asarray(params["ema"]["layer_norm"]["scale"]).copy()
    params2 = model.ema_update(params, num_updates=0)
    after = np.asarray(params2["ema"]["layer_norm"]["scale"])
    assert np.all(after > before)
    # downstream feature extraction works without the teacher
    feats, flens = model.extract_features(params, wav, jnp.asarray([8000, 6000]))
    assert feats.shape[-1] == 32 and int(flens[1]) < int(flens[0])
