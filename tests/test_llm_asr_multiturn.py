"""LLM-ASR multiturn OpenAI-message depth (reference funasr/models/llm_asr/
model.py:666-945 data_template/data_load_speech/inference and LLMASR4
forward:1135-1244 / inference_prepare:1433): span parsing, label masking,
audio-splice training loss, messages-mode generate + teacher forcing."""

import os
import wave

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the fast tier

LLM_CONF = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2, vocab_size=96,
                head_dim=8, rms_norm_eps=1e-6, rope_theta=10000.0,
                tie_word_embeddings=True, qkv_bias=False, qk_norm=True)
ENC_CONF = dict(output_size=24, attention_heads=2, linear_units=48,
                num_blocks=2, kernel_size=5, dropout_rate=0.0)


class ByteTokenizer:
    """Maps bytes -> ids (shifted by 1); id 0 reserved for the audio slot."""

    def encode(self, text):
        return [1 + ((b - 32) % 95) for b in text.encode()][:512]

    def decode(self, ids):
        return "".join(chr(32 + ((i - 1) % 95)) for i in ids if i > 0)


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("llmwav")
    rng = np.random.default_rng(7)
    sig = (rng.standard_normal(6400) * 0.1 * 32767).astype(np.int16)
    p = str(d / "a.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.tobytes())
    return p


def _build():
    import funasr_tpu  # noqa: F401 (registers model classes)
    from funasr_tpu.register import tables
    LLMASR2 = tables.model_classes["LLMASR2"]
    return LLMASR2(
        input_size=80, audio_encoder="SANMEncoder",
        audio_encoder_conf=dict(ENC_CONF),
        audio_adaptor="Linear",
        audio_adaptor_conf=dict(downsample_rate=2, encoder_dim=24, llm_dim=32,
                                ffn_dim=48),
        llm_conf=dict(LLM_CONF))


def _frontend():
    from funasr_tpu.frontends.wav_frontend import WavFrontend
    return WavFrontend(fs=16000, lfr_m=1, lfr_n=1, n_mels=80, dither=0.0)


def _messages(wav_path):
    return [
        {"role": "system", "content": "You transcribe."},
        {"role": "user", "content": "Transcribe: <|startofspeech|>!"
                                    f"{wav_path}<|endofspeech|>"},
        {"role": "assistant", "content": "hello world"},
    ]


def test_data_template_roles(wav_path):
    model = _build()
    contents = model.data_template(_messages(wav_path))
    assert contents["system"] == ["You transcribe."]
    assert len(contents["user"]) == 1 and len(contents["assistant"]) == 1
    # dict passthrough
    again = model.data_template(contents)
    assert again["user"] == contents["user"]


def test_data_load_speech_layout(wav_path):
    """Placeholder count matches the adaptor's audio_token_len; labels mask
    everything except assistant tokens; fbank_beg points at the span start."""
    model = _build()
    tok = ByteTokenizer()
    sample = model.data_load_speech(model.data_template(_messages(wav_path)),
                                    tok, _frontend())
    n_frames = int(sample["speech_lengths"][0])
    expect_slots = model.audio_token_len(n_frames)
    assert int(sample["fake_token_len"][0]) == expect_slots
    assert sample["fbank_mask"].sum() == expect_slots
    beg = int(sample["fbank_beg"][0])
    assert np.all(sample["fbank_mask"][beg: beg + expect_slots] == 1.0)
    # labels: -100 on the whole source span, token ids on the assistant span
    n_src = len(sample["source_ids"])
    assert np.all(sample["labels_ids"][:n_src] == -100)
    tgt = sample["labels_ids"][n_src:]
    assert len(tgt) > 0 and np.all(tgt >= 0)
    assert tok.decode(list(tgt)).startswith("hello world")
    # input_ids agree with labels on the assistant span
    assert np.array_equal(sample["input_ids"][n_src:], tgt)


def test_forward_jit_batch_trains(wav_path):
    """The spliced multiturn CE objective is jittable and learnable: a few
    adam steps on one sample drive the loss down."""
    import optax
    model = _build()
    tok = ByteTokenizer()
    frontend = _frontend()
    sample = model.data_load_speech(model.data_template(_messages(wav_path)),
                                    tok, frontend)
    batch = {
        "speech": sample["speech"][:1],
        "speech_lengths": sample["speech_lengths"][:1],
        "input_ids": sample["input_ids"][None],
        "labels_ids": sample["labels_ids"][None],
        "fbank_mask": sample["fbank_mask"][None],
    }
    batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
    params = model.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            loss, stats, _ = model.forward_jit_batch(p, batch)
            return loss, stats
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for _ in range(20):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses


def test_messages_inference_generate_and_teacher_forcing(wav_path):
    """generate(input=[messages]) returns text via the engine; teacher forcing
    returns a finite loss and the label."""
    model = _build()
    tok = ByteTokenizer()
    frontend = _frontend()
    params = model.init_params(jax.random.PRNGKey(0))
    results, meta = model.inference(params, [_messages(wav_path)],
                                    tokenizer=tok, frontend=frontend,
                                    max_new_tokens=4)
    assert len(results) == 1
    assert results[0]["label"] == "hello world"
    assert "text" in results[0] and "text_tn" in results[0]
    assert meta.get("batch_data_time", 0) > 0

    results_tf, _ = model.inference(params, [_messages(wav_path)],
                                    tokenizer=tok, frontend=frontend,
                                    teacher_forcing=True)
    assert np.isfinite(results_tf[0]["loss"])
    # the reference's "tearchforing" spelling is accepted too
    results_tf2, _ = model.inference(params, [_messages(wav_path)],
                                     tokenizer=tok, frontend=frontend,
                                     tearchforing=True)
    assert np.isfinite(results_tf2[0]["loss"])


def test_openai_dataset_collator_and_trainer(wav_path, tmp_path):
    """OpenAIDataset multiturn rows collate (labels padded -100) and train
    through Trainer's forward_jit_batch dispatch."""
    import json
    import optax
    from funasr_tpu.datasets.specialized_datasets import OpenAIDataset
    from funasr_tpu.datasets.audio_datasets.samplers import BatchSampler
    from funasr_tpu.datasets.dataloader_entry import DataLoader
    from funasr_tpu.parallel.sharding import make_mesh
    from funasr_tpu.train_utils.trainer import Trainer

    rows = []
    for i in range(4):
        rows.append({
            "system": ["You transcribe."],
            "user": [f"Transcribe: <|startofspeech|>!{wav_path}"
                     "<|endofspeech|>"],
            "assistant": ["hello world"],
            "source": wav_path, "target": "hello world",
            "source_len": 6400, "target_len": 11, "key": f"u{i}"})
    jsonl = tmp_path / "mt.jsonl"
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    model = _build()
    tok = ByteTokenizer()
    frontend = _frontend()
    ds = OpenAIDataset(index_ds="IndexDSJsonl",
                       index_ds_conf={"path": str(jsonl)}, tokenizer=tok,
                       frontend=frontend,
                       audio_encoder_downsample_rate=1,
                       audio_adaptor_downsample_rate=2)
    batch = ds.collator([ds[0], ds[1]])
    assert batch["labels_ids"].shape == batch["input_ids"].shape
    pad_region = batch["labels_ids"][:, len(ds[0]["input_ids"]):]
    assert np.all(pad_region == -100)

    loader = DataLoader(ds, BatchSampler(ds, batch_size=2, shuffle=False))
    out = str(tmp_path / "exp_mt")
    trainer = Trainer(model, optax.adam(1e-3), frontend=frontend,
                      output_dir=out, max_epoch=1, log_interval=1,
                      save_checkpoint_interval=0, mesh=make_mesh(1, model=1))
    params = model.init_params(jax.random.PRNGKey(0))
    trainer.run(params, loader, loader)
    logs = [json.loads(line)
            for line in open(os.path.join(out, "train.log.jsonl"))]
    assert np.isfinite(logs[-1]["loss"])
