"""CT-Transformer punctuation parity vs the reference torch implementation."""

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

from conftest import stub_reference_deps  # noqa: E402

stub_reference_deps()


PUNC_LIST = ["<unk>", "_", "，", "。", "？", "、"]
TOKENS = (["<blank>", "<s>", "</s>", "<unk>"]
          + [chr(ord("一") + i) for i in range(96)]
          + ["hello", "world", "ok", "yes", "no"])

CONF = dict(
    encoder="SANMEncoder",
    encoder_conf=dict(input_size=32, output_size=32, attention_heads=4,
                      linear_units=64, num_blocks=2, input_layer="pe",
                      kernel_size=11, sanm_shfit=0, dropout_rate=0.0,
                      positional_dropout_rate=0.0, attention_dropout_rate=0.0),
    vocab_size=len(TOKENS), punc_list=list(PUNC_LIST), embed_unit=32, att_unit=32,
    sentence_end_id=3,
)


class _Tok:
    """Minimal tokenizer facade for the punc inference path."""
    seg_dict = None

    def __init__(self):
        self.token2id = {t: i for i, t in enumerate(TOKENS)}
        self.unk_id = self.token2id["<unk>"]

    def encode(self, text):
        toks = text.split() if isinstance(text, str) else text
        return [self.token2id.get(t, self.unk_id) for t in toks]


def _make_pair():
    torch.manual_seed(11)
    from funasr.models.ct_transformer.model import CTTransformer as RefPunc
    from funasr_tpu.convert.torch_to_jax import convert_ct_transformer
    from funasr_tpu.models.ct_transformer.model import CTTransformer

    ref = RefPunc(**CONF).eval()
    mine = CTTransformer(**CONF)
    params = convert_ct_transformer(dict(ref.state_dict()), mine)
    return ref, mine, params


def _text(n_words, seed):
    rng = np.random.default_rng(seed)
    zh = [chr(ord("一") + i) for i in range(96)]
    words = [zh[rng.integers(0, 96)] if rng.random() < 0.8
             else ["hello", "world", "ok"][rng.integers(0, 3)]
             for _ in range(n_words)]
    return "".join(w if len(w) > 1 else w for w in
                   [w + (" " if len(w) > 1 else "") for w in words]).strip()


@pytest.mark.parametrize("n_words", [8, 30, 55])
def test_punc_text_matches_reference(n_words):
    ref, mine, params = _make_pair()
    text = _text(n_words, seed=n_words)
    tok = _Tok()
    with torch.no_grad():
        want, _ = ref.inference([text], key=["k"], tokenizer=tok, device="cpu")
    got, _ = mine.inference(params, [text], key=["k"], tokenizer=tok)
    assert got[0]["text"] == want[0]["text"]
    np.testing.assert_array_equal(
        np.asarray(got[0]["punc_array"]),
        np.asarray(want[0]["punc_array"]))
