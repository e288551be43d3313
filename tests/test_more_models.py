"""SOND/xvector, MossFormer, MFCCA, SA-ASR, LCBNet, DynamicStreamingVAD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

TOKENS = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i) for i in range(20)] + ["<unk>"]
TINY_PARA = dict(
    input_size=560, vocab_size=len(TOKENS),
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                      att_layer_num=2, kernel_size=5, sanm_shfit=0),
    predictor_conf=dict(idim=16), sos=1, eos=2, predictor_bias=1)


def _frontend():
    from funasr_tpu.frontends.wav_frontend import WavFrontend
    return WavFrontend(fs=16000, lfr_m=7, lfr_n=6, n_mels=80, dither=0.0)


def _tok():
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer
    return CharTokenizer(token_list=list(TOKENS))


def test_xvector(rng):
    from funasr_tpu.models.sond.model import XVector
    m = XVector(input_size=80, embedding_size=64)
    p = m.init_params(jax.random.PRNGKey(0))
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    res, _ = m.inference(p, [wav, wav[:8000]])
    assert res[0]["spk_embedding"].shape == (2, 64)


def test_sond(rng):
    # SOND also composes with a SANM speech encoder (config flexibility on
    # top of the default resnet34 pipeline, which test_sond_parity covers)
    from funasr_tpu.models.sond.model import DiarSondModel
    m = DiarSondModel(encoder="SANMEncoder",
                      encoder_conf=dict(output_size=16, attention_heads=2,
                                        linear_units=32, num_blocks=2,
                                        kernel_size=5, input_layer="pe"),
                      decoder_conf=dict(in_units=8, filter_size=5,
                                        fsmn_num_layers=1, dnn_num_layers=1,
                                        num_memory_units=16, ffn_inner_dim=32,
                                        out_units=16),
                      cd_scorer_conf=dict(input_size=32, output_size=16,
                                          attention_heads=2, linear_units=32,
                                          num_blocks=1, input_layer="null",
                                          out_units=1),
                      token_list=[str(i) for i in range(16)],
                      input_size=560, spk_embed_dim=8, max_spk_num=4)
    p = m.init_params(jax.random.PRNGKey(0))
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    profiles = rng.standard_normal((1, 4, 8)).astype(np.float32)
    res, _ = m.inference(p, wav, frontend=_frontend(), profiles=profiles)
    assert isinstance(res[0]["value"], list)
    feats, flens = _frontend().extract([wav])
    labels = jnp.asarray(rng.integers(0, 2, (1, feats.shape[1], 4)),
                         jnp.float32)
    loss, _, _ = m.forward_jit(p, jnp.asarray(feats), jnp.asarray(flens),
                               jnp.asarray(profiles),
                               binary_labels=labels,
                               binary_labels_lengths=jnp.asarray(flens))
    assert np.isfinite(float(loss))


def test_mossformer(rng):
    from funasr_tpu.models.mossformer.model import MossFormer
    m = MossFormer(num_spks=2, d_model=32, ffn_dim=64, num_blocks=2,
                   encoder_kernel=16, conv_kernel=7)
    p = m.init_params(jax.random.PRNGKey(0))
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    res, _ = m.inference(p, wav)
    assert len(res[0]["value"]) == 2
    assert res[0]["value"][0].shape[0] > 7000


def test_mfcca(rng):
    from funasr_tpu.models.mfcca.model import MFCCA
    m = MFCCA(input_size=80, vocab_size=len(TOKENS), ctc_weight=0.3,
              encoder_conf=dict(output_size=32, attention_heads=2,
                                linear_units=64, num_blocks=2),
              decoder_conf=dict(attention_heads=2, linear_units=64, num_blocks=2),
              channel_attention_heads=2)
    p = m.init_params(jax.random.PRNGKey(0))
    speech = jnp.asarray(rng.standard_normal((1, 2, 40, 80)), jnp.float32)  # 2ch
    text = jnp.asarray(rng.integers(3, len(TOKENS), (1, 4)), jnp.int32)
    loss, _, _ = m.forward_jit(p, speech, jnp.asarray([40]), text,
                               jnp.asarray([4]), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_sa_asr(rng):
    from funasr_tpu.models.sa_asr.model import SAASR
    m = SAASR(**TINY_PARA, spk_embed_dim=8, spk_attention_heads=2)
    p = m.init_params(jax.random.PRNGKey(0))
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    profiles = rng.standard_normal((1, 3, 8)).astype(np.float32)
    res, _ = m.inference(p, wav, tokenizer=_tok(), frontend=_frontend(),
                         profiles=profiles)
    assert "spk_ids" in res[0]
    assert all(0 <= s < 3 for s in res[0]["spk_ids"])


def test_lcbnet(rng):
    from funasr_tpu.models.sa_asr.model import LCBNet
    m = LCBNet(**TINY_PARA, bias_encoder_blocks=1, bias_attention_heads=2)
    p = m.init_params(jax.random.PRNGKey(0))
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    res_plain, _ = m.inference(p, wav, tokenizer=_tok(), frontend=_frontend())
    res_bias, _ = m.inference(p, wav, tokenizer=_tok(), frontend=_frontend(),
                              ocr_text="一丁丂")
    assert "text" in res_plain[0] and "text" in res_bias[0]


def test_dynamic_vad(rng):
    from funasr_tpu.models.fsmn_vad_streaming.dynamic_vad import DynamicStreamingVAD
    from funasr_tpu.models.fsmn_vad_streaming.model import FsmnVADStreaming
    from funasr_tpu.frontends.wav_frontend import WavFrontendOnline
    vad = FsmnVADStreaming(
        encoder="FSMN",
        encoder_conf=dict(input_dim=400, input_affine_dim=64, fsmn_layers=2,
                          linear_dim=64, proj_dim=32, lorder=10, rorder=0,
                          lstride=1, rstride=1, output_affine_dim=64,
                          output_dim=8))
    params = vad.init_params(jax.random.PRNGKey(0))
    fe = WavFrontendOnline(fs=16000, lfr_m=5, lfr_n=1, n_mels=80, dither=0.0)
    dvad = DynamicStreamingVAD(vad, vad_params=params, frontend=fe)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    events = []
    for i in range(0, len(wav), 1600):
        events += dvad.feed(wav[i:i + 1600], is_final=(i + 1600 >= len(wav)))
    # random weights: just assert the protocol shape
    for ev in events:
        assert len(ev) == 2


def test_s3prl_frontend(rng):
    from funasr_tpu.frontends.s3prl import S3prlFrontend
    fe = S3prlFrontend(frontend_conf=dict(
        upstream="data2vec",
        upstream_conf=dict(encoder_conf=dict(
            input_size=1, conv_feature_layers="[(16,10,5)] + [(16,3,2)]",
            encoder_layers=2, encoder_embed_dim=16, encoder_ffn_embed_dim=32,
            encoder_attention_heads=2, conv_pos=4, conv_pos_groups=2,
            average_top_k_layers=2))))
    wavs = [(rng.standard_normal(4000) * 0.1).astype(np.float32),
            (rng.standard_normal(3000) * 0.1).astype(np.float32)]
    feats, lens = fe.extract(wavs)
    assert feats.shape[0] == 2 and feats.shape[-1] == 16
    assert lens[1] < lens[0]
    # multilayer featurizer path (s3prl Featurizer role)
    fe2 = S3prlFrontend(multilayer_feature=True, frontend_conf=dict(
        upstream="data2vec",
        upstream_conf=dict(encoder_conf=dict(
            input_size=1, conv_feature_layers="[(16,10,5)] + [(16,3,2)]",
            encoder_layers=2, encoder_embed_dim=16, encoder_ffn_embed_dim=32,
            encoder_attention_heads=2, conv_pos=4, conv_pos_groups=2,
            average_top_k_layers=2))))
    feats2, lens2 = fe2.extract(wavs)
    assert feats2.shape == feats.shape
