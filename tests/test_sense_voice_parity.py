"""SenseVoiceSmall parity vs the reference torch implementation (greedy decode ids)."""

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

CONF = dict(
    encoder="SenseVoiceEncoderSmall",
    encoder_conf=dict(output_size=32, attention_heads=4, linear_units=64,
                      num_blocks=3, tp_blocks=2, kernel_size=11, sanm_shfit=0,
                      dropout_rate=0.0, positional_dropout_rate=0.0,
                      attention_dropout_rate=0.0),
    input_size=40, vocab_size=26000, blank_id=0,
)


def test_sense_voice_greedy_parity(rng):
    torch.manual_seed(9)
    from funasr.models.sense_voice.model import SenseVoiceSmall as RefSV
    from funasr_tpu.convert.torch_to_jax import convert_sense_voice
    from funasr_tpu.models.sense_voice.model import SenseVoiceSmall

    ref = RefSV(**CONF).eval()
    mine = SenseVoiceSmall(**CONF)
    params = convert_sense_voice(dict(ref.state_dict()), mine)

    b, t = 2, 30
    speech = rng.standard_normal((b, t, 40)).astype(np.float32)
    lens = np.array([30, 22])

    # reference encode path (inference-style prompt: language auto=0, woitn)
    with torch.no_grad():
        sp = torch.from_numpy(speech)
        sl = torch.from_numpy(lens).clone()
        language_query = ref.embed(torch.LongTensor([[0]])).repeat(b, 1, 1)
        textnorm_query = ref.embed(torch.LongTensor([[15]])).repeat(b, 1, 1)
        sp = torch.cat((textnorm_query, sp), dim=1)
        sl = sl + 1
        event_emo = ref.embed(torch.LongTensor([[1, 2]])).repeat(b, 1, 1)
        sp = torch.cat((torch.cat((language_query, event_emo), dim=1), sp), dim=1)
        sl = sl + 3
        enc, enc_lens = ref.encoder(sp, sl)
        want_logits = ref.ctc.log_softmax(enc)
        want_ids = want_logits.argmax(-1).numpy()

    import jax.numpy as jnp
    got_ids, got_lens, got_logits = mine.infer_jit(
        params, jnp.asarray(speech), jnp.asarray(lens),
        jnp.zeros((b,), jnp.int32), jnp.full((b,), 15, jnp.int32))
    got_ids = np.asarray(got_ids)
    for i in range(b):
        n = int(lens[i]) + 4
        np.testing.assert_array_equal(got_ids[i, :n], want_ids[i, :n])
    np.testing.assert_allclose(np.asarray(got_logits)[0, : lens[0] + 4],
                               want_logits[0, : lens[0] + 4].numpy(),
                               rtol=2e-3, atol=2e-3)


def test_rich_transcription_postprocess():
    from funasr_tpu.utils.postprocess_utils import rich_transcription_postprocess
    s = "<|zh|><|HAPPY|><|Speech|><|withitn|>你好世界"
    assert rich_transcription_postprocess(s) == "😊你好世界"
    s2 = "<|en|><|NEUTRAL|><|Speech|><|woitn|>hello world"
    assert rich_transcription_postprocess(s2) == "hello world"
