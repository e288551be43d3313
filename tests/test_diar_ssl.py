"""EEND-OLA diarization + data2vec SSL tests."""

import jax
import jax.numpy as jnp
import numpy as np


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
    from funasr_tpu.models.data2vec.model import Data2VecAudio
    model = Data2VecAudio(model_conf=dict(embed_dim=32, depth=2, num_heads=4,
                                          mlp_ratio=2.0), mask_prob=0.5,
                          mask_length=3, top_k_layers=2, ema_decay=0.9)
    params = model.init_params(jax.random.PRNGKey(0))
    wav = jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32)
    loss, stats, _ = model.forward_jit(params, wav, jnp.asarray([8000, 8000]),
                                       rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and float(stats["masked_frames"]) > 0
    # EMA moves teacher toward student
    params["student"]["mask_emb"] = params["student"]["mask_emb"] + 1.0
    before = np.asarray(params["teacher"]["mask_emb"]).copy()
    params2 = model.ema_update(params)
    after = np.asarray(params2["teacher"]["mask_emb"])
    assert np.all(after > before)
