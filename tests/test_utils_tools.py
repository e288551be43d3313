"""Utility-layer tests: hotword postprocess, DatadirWriter, data CLIs, AutoFrontend,
StableHLO export round-trip."""

import json
import os
import wave

import numpy as np
import pytest


def test_postprocess_hotwords():
    from funasr_tpu.utils.postprocess_hotwords import (
        apply_postprocess_hotwords_to_results)
    results = [{"text": "今天去阿里巴巴开会"}]
    out = apply_postprocess_hotwords_to_results(
        results, {"postprocess_hotwords": {"阿里巴巴": "阿裡巴巴"}})
    assert out[0]["text"] == "今天去阿裡巴巴开会"
    # fuzzy: decoded '达摩院' variant
    results = [{"text": "欢迎来到打磨院参观"}]
    out = apply_postprocess_hotwords_to_results(
        results, {"postprocess_hotwords": ["达摩院"],
                  "postprocess_hotword_threshold": 0.3,
                  "return_postprocess_hotword_matches": True})
    assert out[0]["text"] == "欢迎来到达摩院参观"
    assert out[0]["postprocess_hotword_matches"][0]["to"] == "达摩院"


def test_datadir_writer(tmp_path):
    from funasr_tpu.utils.datadir_writer import DatadirWriter
    w = DatadirWriter(str(tmp_path))
    w["1best_recog"]["text"]["utt1"] = "你好"
    w["1best_recog"]["token"]["utt1"] = "你 好"
    w.close()
    assert open(tmp_path / "1best_recog" / "text").read() == "utt1\t你好\n"


def test_scp2jsonl_roundtrip(tmp_path):
    from funasr_tpu.bin.data_tools import jsonl2scp, scp2jsonl
    wav_path = tmp_path / "a.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(1600, np.int16).tobytes())
    (tmp_path / "wav.scp").write_text(f"utt1\t{wav_path}\n")
    (tmp_path / "text.txt").write_text("utt1\t你好世界\n")
    out = tmp_path / "data.jsonl"
    scp2jsonl([str(tmp_path / "wav.scp"), str(tmp_path / "text.txt")],
              ["source", "target"], str(out))
    obj = json.loads(out.read_text().strip())
    # source_len counts 10 ms frames (1600 samples -> 10), matching the
    # reference scp2jsonl.py whose token-budget batching expects frames
    assert obj["source_len"] == 10 and obj["target_len"] == 4
    jsonl2scp(str(out), str(tmp_path / "back.scp"))
    assert "utt1" in (tmp_path / "back.scp").read_text()


def test_auto_frontend(tmp_path):
    from funasr_tpu.auto.auto_frontend import AutoFrontend
    fe = AutoFrontend(frontend="WavFrontend",
                      frontend_conf=dict(fs=16000, lfr_m=7, lfr_n=6, n_mels=80,
                                         dither=0.0),
                      model_conf={})
    wav = (np.random.default_rng(0).standard_normal(16000) * 0.1).astype(np.float32)
    res = fe(wav)
    assert res[0]["input"].shape[-1] == 560
    assert res[0]["input_len"] > 0


def test_stablehlo_export_roundtrip(tmp_path):
    """Export a tiny Paraformer and re-run the deserialized function."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from funasr_tpu.bin.export import export_model
    from funasr_tpu.models.paraformer.model import Paraformer

    model = Paraformer(
        input_size=560, vocab_size=32,
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=2, kernel_size=5),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                          att_layer_num=2, kernel_size=5, sanm_shfit=0),
        predictor_conf=dict(idim=16), sos=1, eos=2, predictor_bias=1)
    params = model.init_params(jax.random.PRNGKey(0))
    manifest = export_model(model, params, str(tmp_path), buckets=[(2, 32)])
    path = tmp_path / manifest[0]["file"]
    blob = path.read_bytes()
    fn = jexport.deserialize(blob)
    speech = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 560)),
                         jnp.float32)
    out = fn.call(params, speech, jnp.asarray([32, 20], jnp.int32))
    yseq, token_lens, score = out
    assert yseq.shape[0] == 2
