"""Streaming (VAD-aware) CT-Transformer: parity vs the reference torch model and
cache-carry behavior of the incremental inference protocol."""

import os
import sys

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
          + [chr(ord("一") + i) for i in range(96)])

CONF = dict(
    encoder="SANMVadEncoder",
    encoder_conf=dict(input_size=32, output_size=32, attention_heads=4,
                      linear_units=64, num_blocks=3, input_layer="pe",
                      kernel_size=11, sanm_shfit=0, dropout_rate=0.0,
                      positional_dropout_rate=0.0, attention_dropout_rate=0.0),
    vocab_size=len(TOKENS), punc_list=list(PUNC_LIST), embed_unit=32, att_unit=32,
    sentence_end_id=3,
)


class _Tok:
    def __init__(self):
        self.token2id = {t: i for i, t in enumerate(TOKENS)}
        self.unk_id = self.token2id["<unk>"]


def _make_pair():
    torch.manual_seed(3)
    from funasr.models.ct_transformer_streaming.model import (
        CTTransformerStreaming as RefPunc)
    from funasr_tpu.convert.torch_to_jax import convert_ct_transformer
    from funasr_tpu.models.ct_transformer_streaming.model import CTTransformerStreaming

    ref = RefPunc(**CONF).eval()
    mine = CTTransformerStreaming(**CONF)
    params = convert_ct_transformer(dict(ref.state_dict()), mine)
    return ref, mine, params


def test_vad_punc_forward_parity():
    ref, mine, params = _make_pair()
    rng = np.random.default_rng(0)
    ids = rng.integers(4, len(TOKENS), (1, 17)).astype(np.int64)
    for vad_pos in (0, 1, 5, 16, 17):
        with torch.no_grad():
            y_ref, _ = ref.punc_forward(torch.from_numpy(ids),
                                        torch.tensor([17]),
                                        torch.tensor([vad_pos]))
        y = mine.punc_forward(params, ids, np.asarray([17]),
                              np.asarray([vad_pos]))
        np.testing.assert_allclose(np.asarray(y)[0], y_ref.numpy()[0],
                                   rtol=2e-4, atol=2e-4, err_msg=f"vad={vad_pos}")


def test_streaming_inference_cache_carry():
    _, mine, params = _make_pair()
    tok = _Tok()
    cache = {}
    chunk1 = "".join(TOKENS[4:12])
    r1, _ = mine.inference(params, [chunk1], key=["k"], tokenizer=tok, cache=cache)
    assert isinstance(r1[0]["text"], str)
    # pre_text must hold the tail after the last sentence end (possibly all words)
    assert isinstance(cache["pre_text"], list) and len(cache["pre_text"]) <= 8
    # emitted text never ends with a punctuation mark mid-stream
    assert not r1[0]["text"] or r1[0]["text"][-1] not in PUNC_LIST

    pre = list(cache["pre_text"])
    chunk2 = "".join(TOKENS[12:20])
    r2, _ = mine.inference(params, [chunk2], key=["k"], tokenizer=tok, cache=cache)
    # the second call must not re-emit the carried pre-text words
    assert not r2[0]["text"].startswith("".join(pre)) or not pre
