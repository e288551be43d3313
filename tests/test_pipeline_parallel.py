"""Pipeline parallelism (funasr_tpu.parallel.pipeline): GPipe schedule over
the stacked encoder-layer axis via shard_map + ppermute.

The reference's multi-device training is DDP/DeepSpeed-ZeRO
(``funasr/bin/train.py:80-170``, ``train_ds.py``) with no pipeline engine;
this is the TPU-native extension: layer-stacked params shard over a stage
axis and activations rotate on ICI neighbor links.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from funasr_tpu.parallel.pipeline import (make_pipeline_runner,
                                          pipeline_apply, pp_param_shardings)
from funasr_tpu.parallel.sharding import make_mesh

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier


def _toy(L=8, B=4, T=6, D=16):
    k = jax.random.PRNGKey(0)
    stacked = {"w": jax.random.normal(k, (L, D, D)) * 0.1,
               "b": jax.random.normal(jax.random.fold_in(k, 1), (L, D)) * 0.1}
    x = jax.random.normal(jax.random.fold_in(k, 2), (B, T, D))
    lens = jnp.array([6, 5, 4, 6])
    mask = jnp.arange(T)[None, :] < lens[:, None]
    return stacked, x, mask


def _layer(lp, a, ctx):
    h = jnp.tanh(a @ lp["w"] + lp["b"])
    return (a + h) * ctx["mask"][..., None]


def _seq(stacked, x, mask):
    def body(a, lp):
        return _layer(lp, a, {"mask": mask}), None
    out, _ = jax.lax.scan(body, x, stacked)
    return out


def test_pipeline_matches_scan_fwd_and_grad():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model=4)  # dp=2 x 4 stages
    stacked, x, mask = _toy()
    gold = _seq(stacked, x, mask)
    with mesh:
        out = pipeline_apply(_layer, stacked, x, {"mask": mask}, mesh=mesh,
                             n_micro=2)
    np.testing.assert_allclose(out, gold, atol=1e-5)

    def loss_pp(st, xx):
        with mesh:
            y = pipeline_apply(_layer, st, xx, {"mask": mask}, mesh=mesh,
                               n_micro=2)
        return jnp.sum(y ** 2)

    g_pp = jax.grad(loss_pp)(stacked, x)
    g_seq = jax.grad(lambda st, xx: jnp.sum(_seq(st, xx, mask) ** 2))(stacked,
                                                                      x)
    for kk in g_pp:
        np.testing.assert_allclose(g_pp[kk], g_seq[kk], atol=1e-4)


def test_pipeline_under_jit_with_sharded_params():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model=4)
    stacked, x, mask = _toy()
    gold = _seq(stacked, x, mask)
    shardings = pp_param_shardings({"encoders": stacked}, mesh)
    sharded = jax.device_put({"encoders": stacked}, shardings)
    # stage-sharded leading dim, everything else replicated
    assert "model" in str(shardings["encoders"]["w"].spec)

    @jax.jit
    def f(st, xx):
        return pipeline_apply(_layer, st["encoders"], xx, {"mask": mask},
                              mesh=mesh, n_micro=2)

    with mesh:
        out = f(sharded, x)
    np.testing.assert_allclose(out, gold, atol=1e-5)


def test_pipeline_batch_divisibility_error():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model=4)
    stacked, x, mask = _toy(B=4)
    with pytest.raises(ValueError, match="divisible"):
        with mesh:
            pipeline_apply(_layer, stacked, x, {"mask": mask}, mesh=mesh,
                           n_micro=4)  # 4/4=1 per micro, not divisible by dp=2


def test_sanm_encoder_pipeline_parity():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from funasr_tpu.models.sanm.encoder import SANMEncoder

    mesh = make_mesh(8, model=4)
    enc = SANMEncoder(input_size=24, output_size=16, attention_heads=2,
                      linear_units=32, num_blocks=5, kernel_size=5,
                      dropout_rate=0.0)  # 4 stacked blocks = 4 stages
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 24))
    lens = jnp.array([10, 8, 6, 10])
    gold, gold_lens = enc(params, x, lens)

    enc.pipeline_runner = make_pipeline_runner(mesh, n_micro=2)
    try:
        with mesh:
            out, out_lens = enc(params, x, lens)
    finally:
        enc.pipeline_runner = None
    np.testing.assert_allclose(out, gold, atol=1e-5)
    np.testing.assert_array_equal(out_lens, gold_lens)


def test_trainer_pp_loss_matches_dp(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import optax
    from funasr_tpu.models.paraformer.model import Paraformer
    from funasr_tpu.train_utils.trainer import Trainer

    def build():
        return Paraformer(
            input_size=24, vocab_size=12,
            encoder_conf=dict(output_size=16, attention_heads=2,
                              linear_units=32, num_blocks=5, kernel_size=5,
                              dropout_rate=0.0),
            decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                              att_layer_num=2, kernel_size=5, sanm_shfit=0),
            predictor_conf=dict(idim=16, l_order=1, r_order=1,
                                tail_threshold=0.45),
            sos=1, eos=2, predictor_bias=1, sampling_ratio=0.0)

    rng = np.random.default_rng(0)
    batch = {
        "speech": rng.standard_normal((4, 20, 24)).astype(np.float32),
        "speech_lengths": np.array([20, 18, 16, 20], np.int32),
        "text": rng.integers(3, 12, (4, 5)).astype(np.int32),
        "text_lengths": np.array([5, 4, 5, 3], np.int32),
    }

    losses = {}
    for mode, model_axis in (("dp", 1), ("pp", 4)):
        model = build()
        params = model.init_params(jax.random.PRNGKey(0))
        mesh = make_mesh(8 if mode == "pp" else 2, model=model_axis)
        tr = Trainer(model, optax.adam(1e-3), output_dir=str(tmp_path / mode),
                     max_epoch=1, log_interval=1, save_checkpoint_interval=0,
                     use_tensorboard=False, mesh=mesh, sharding=mode,
                     pp_micro=2, resume=False)
        with mesh:
            p = jax.device_put(
                params, (pp_param_shardings(params, mesh) if mode == "pp"
                         else None))
            opt_state = tr.tx.init(p)
            sharded = tr._shard_batch(batch)
            p2, opt_state, stats = tr._step_jit(p, opt_state, sharded,
                                                jax.random.PRNGKey(7))
            losses[mode] = float(stats["loss"])
        if mode == "pp":
            model.encoder.pipeline_runner = None
    assert np.isfinite(losses["pp"])
    np.testing.assert_allclose(losses["pp"], losses["dp"], rtol=1e-4)


def test_trainer_rejects_unknown_sharding(tmp_path):
    import optax
    from funasr_tpu.train_utils.trainer import Trainer

    with pytest.raises(ValueError, match="sharding"):
        Trainer(object(), optax.adam(1e-3), output_dir=str(tmp_path),
                sharding="zz")
