"""emotion2vec full-trunk parity vs the reference torch model (data2vec-2.0
audio: conv extractor + positional conv + alibi + extra tokens + AltBlocks)."""

import os
import sys

import numpy as np
import pytest
import yaml

REF = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")]
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")
from conftest import stub_reference_deps  # noqa: E402

stub_reference_deps()

# the reference model only needs OmegaConf.create -> attr/get access; the
# package is absent in this image, so inject a minimal shim
if "omegaconf" not in sys.modules:
    import importlib.machinery
    import types

    class _Dot(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def get(self, k, default=None):
            return super().get(k, default)

    def _wrap(obj):
        if isinstance(obj, dict):
            return _Dot({k: _wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [_wrap(v) for v in obj]
        return obj

    mod = types.ModuleType("omegaconf")
    mod.__spec__ = importlib.machinery.ModuleSpec("omegaconf", None)

    class OmegaConf:  # noqa: N801 (mirror the real API name)
        @staticmethod
        def create(obj):
            return _wrap(obj)

    mod.OmegaConf = OmegaConf
    mod.open_dict = None
    mod.MISSING = "???"
    mod.II = lambda s: s
    sys.modules["omegaconf"] = mod


def _small_conf():
    with open(os.path.join(REF, "funasr/models/emotion2vec/template.yaml"),
              encoding="utf-8") as f:
        tpl = yaml.safe_load(f)
    conf = tpl["model_conf"]
    conf.update(embed_dim=64, depth=2, num_heads=4, layerdrop=0.0,
                encoder_dropout=0.0, post_mlp_drop=0.0, attention_dropout=0.0,
                activation_dropout=0.0, dropout_input=0.0,
                norm_eps=1e-5)  # pyyaml reads the template's "1e-05" as str
    aud = conf["modalities"]["audio"]
    aud.update(prenet_depth=2, prenet_layerdrop=0.0, prenet_dropout=0.0,
               num_extra_tokens=4, num_alibi_heads=4, conv_pos_depth=2,
               conv_pos_groups=4, model_depth=2,
               feature_encoder_spec="[(32, 10, 5)] + [(32, 3, 2)]")
    return conf


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(23)
    from funasr.models.emotion2vec.model import Emotion2vec as RefE2V
    from funasr_tpu.convert.torch_to_jax import convert_state_dict
    from funasr_tpu.models.emotion2vec.model import Emotion2vec

    conf = _small_conf()
    ref = RefE2V(model_conf=conf, vocab_size=9).eval()
    # give the zero-init extra tokens real values so the test exercises them
    with torch.no_grad():
        ref.modality_encoders["AUDIO"].extra_tokens.normal_(0, 0.5)
    mine = Emotion2vec(model_conf=conf, vocab_size=9)
    params = convert_state_dict(dict(ref.state_dict()), mine, "Emotion2vec")
    return ref, mine, params


def test_extract_features_parity(pair, rng):
    ref, mine, params = pair
    wav = rng.standard_normal((1, 3200)).astype(np.float32)
    with torch.no_grad():
        want = ref.extract_features(torch.from_numpy(wav),
                                    padding_mask=None)["x"].numpy()
    import jax.numpy as jnp
    got = np.asarray(mine.extract_features(params, jnp.asarray(wav)))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_inference_scores_parity(pair, rng):
    """End-to-end: waveform layer-norm -> trunk -> mean pool -> emotion head
    softmax with 'unuse' labels masked, vs the reference inference() math."""
    ref, mine, params = pair
    wav = rng.standard_normal(4800).astype(np.float32) * 0.1

    class Tok:
        token_list = ["angry", "unuse1", "happy", "neutral", "sad",
                      "unuse2", "surprised", "fearful", "disgusted"]

    with torch.no_grad():
        src = torch.from_numpy(wav)
        src = torch.nn.functional.layer_norm(src, src.shape).view(1, -1)
        x = ref.extract_features(src, padding_mask=None)["x"]
        pooled = x.mean(dim=1)
        logits = ref.proj(pooled)
        for idx, lab in enumerate(Tok.token_list):
            if lab.startswith("unuse"):
                logits[:, idx] = -np.inf
        want_scores = torch.softmax(logits, dim=-1)[0].numpy()
    want = [s for s, lb in zip(want_scores, Tok.token_list)
            if not lb.startswith("unuse")]

    res, _ = mine.inference(params, wav, tokenizer=Tok())
    got = np.asarray(res[0]["scores"])
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-3, atol=2e-3)
    assert res[0]["labels"] == [lb for lb in Tok.token_list
                                if not lb.startswith("unuse")]
    assert res[0]["feats"].shape == (64,)


def test_finetune_loss_finite(pair, rng):
    import jax
    import jax.numpy as jnp
    _, mine, params = pair
    wav = jnp.asarray(rng.standard_normal((2, 3200)), jnp.float32)
    labels = jnp.asarray([[2], [4]], jnp.int32)

    def loss_fn(p):
        return mine.forward_jit(p, wav, jnp.asarray([3200, 3200]), labels,
                                None)[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gn = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                            for g in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gn) and gn > 0
