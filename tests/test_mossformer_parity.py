"""MossFormer full-model parity vs the reference torch modules: encoder,
FLASH gated-attention MaskNet, and separated sources end to end."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")]
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")
from conftest import stub_sond_legacy_deps  # noqa: E402

stub_sond_legacy_deps()


def _install_rotary_stub():
    """Minimal rotary_embedding_torch matching the library's convention:
    interleaved pair rotation of the first ``dim`` features, positions on the
    -2 axis (the package is absent from this image)."""
    if "rotary_embedding_torch" in sys.modules:
        return
    import importlib.machinery

    class RotaryEmbedding(torch.nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.dim = dim
            inv = 1.0 / (10000 ** (torch.arange(0, dim, 2).float() / dim))
            self.register_buffer("inv_freq", inv)

        def rotate_queries_or_keys(self, x):
            n = x.shape[-2]
            angles = torch.arange(n).float()[:, None] * self.inv_freq[None]
            angles = angles.repeat_interleave(2, dim=-1)
            cos, sin = angles.cos(), angles.sin()
            x_rot, x_pass = x[..., : self.dim], x[..., self.dim:]
            x1, x2 = x_rot[..., 0::2], x_rot[..., 1::2]
            rot_half = torch.stack((-x2, x1), dim=-1).reshape(x_rot.shape)
            x_rot = x_rot * cos + rot_half * sin
            return torch.cat([x_rot, x_pass], dim=-1)

    mod = types.ModuleType("rotary_embedding_torch")
    mod.__spec__ = importlib.machinery.ModuleSpec("rotary_embedding_torch",
                                                  None)
    mod.RotaryEmbedding = RotaryEmbedding
    sys.modules["rotary_embedding_torch"] = mod


_install_rotary_stub()

# reference e2e imports legacy module paths; alias them to the real files
import funasr.models.mossformer.mossformer as _mcore  # noqa: E402
import funasr.models.mossformer.mossformer_encoder as _menc  # noqa: E402
import funasr.models.mossformer.mossformer_decoder as _mdec  # noqa: E402

# the reference guards `from rotary_embedding_torch import RotaryEmbedding`
# with try/except, so inject the stub into the already-imported modules too
_menc.RotaryEmbedding = sys.modules["rotary_embedding_torch"].RotaryEmbedding
_mcore.RotaryEmbedding = sys.modules["rotary_embedding_torch"].RotaryEmbedding

sys.modules["funasr.models.encoder.mossformer_encoder"] = _menc
sys.modules["funasr.models.encoder"].mossformer_encoder = _menc
sys.modules["funasr.models.decoder.mossformer_decoder"] = _mdec
sys.modules["funasr.models.decoder"].mossformer_decoder = _mdec

D, BLOCKS, K, SPKS, G, QK = 16, 2, 8, 2, 16, 8


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(5)
    # the reference builds blocks with group_size/query_key_dim defaults;
    # shrink them by patching the module constants through the constructor
    import funasr.models.mossformer.mossformer_encoder as menc

    orig_m = menc.MossFormerM

    class SmallM(orig_m):
        def __init__(self, num_blocks, d_model=None, causal=False,
                     group_size=256, query_key_dim=128, expansion_factor=4.0,
                     attn_dropout=0.1):
            super().__init__(num_blocks, d_model, causal, G, QK, 4.0, 0.0)

    menc.MossFormerM = SmallM
    try:
        from funasr.models.mossformer.e2e_ss import MossFormer as RefModel
        ref = RefModel(in_channels=D, out_channels=D, num_blocks=BLOCKS,
                       kernel_size=K, norm="ln", num_spks=SPKS).eval()
    finally:
        menc.MossFormerM = orig_m

    from funasr_tpu.convert.torch_to_jax import convert_state_dict
    from funasr_tpu.models.mossformer.model import MossFormer
    mine = MossFormer(in_channels=D, out_channels=D, num_blocks=BLOCKS,
                      kernel_size=K, num_spks=SPKS, group_size=G,
                      query_key_dim=QK, expansion_factor=4.0)
    params = convert_state_dict(dict(ref.state_dict()), mine, "MossFormer")
    return ref, mine, params


def test_mossformer_separation_parity(pair, rng):
    ref, mine, params = pair
    wav = rng.standard_normal((2, 400)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(wav))
    got = mine.separate(params, wav)
    assert len(got) == SPKS
    for s in range(SPKS):
        np.testing.assert_allclose(np.asarray(got[s]), want[s].numpy(),
                                   rtol=2e-3, atol=2e-4)


def test_mossformer_train_step(pair, rng):
    import jax
    import jax.numpy as jnp
    _, mine, params = pair
    wav = jnp.asarray(rng.standard_normal((2, 400)), jnp.float32)
    refs = jnp.asarray(rng.standard_normal((2, SPKS, 400)), jnp.float32)

    def loss_fn(p):
        loss, _, _ = mine.forward_jit(p, wav, jnp.asarray([400, 400]), refs)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0
