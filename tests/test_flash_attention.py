"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def xla_attention(q, k, v, lengths):
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    mask = jnp.arange(k.shape[2])[None, None, None, :] < lengths[:, None, None, None]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("t,block", [(256, 128), (512, 256)])
def test_flash_matches_xla(rng, t, block):
    from funasr_tpu.ops.flash_attention import flash_attention
    b, h, d = 2, 2, 128
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    lengths = jnp.asarray([t, t - 37])
    want = np.asarray(xla_attention(q, k, v, lengths))
    got = np.asarray(flash_attention(q, k, v, lengths, block_q=block,
                                     block_k=block, interpret=True))
    # only valid query rows matter (padded queries attend garbage consistently)
    for i, ln in enumerate([t, t - 37]):
        np.testing.assert_allclose(got[i, :, :ln], want[i, :, :ln],
                                   rtol=2e-3, atol=2e-3)
