"""Specialized dataset packs: vicuna/qwenaudio prompt templates and the ChatML
multiturn OpenAI dataset with inline audio spans."""

import json
import wave

import numpy as np
import pytest

TOKENS = ["<blank>", "<s>", "</s>"] + [chr(ord("一") + i)
                                       for i in range(20)] + ["<unk>"]


def _wav(path, rng, n=8000):
    wav = (rng.standard_normal(n) * 0.1 * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(wav.tobytes())
    return n


@pytest.fixture
def jsonl_dir(tmp_path, rng):
    lines = []
    for i in range(3):
        path = tmp_path / f"u{i}.wav"
        n = _wav(path, rng)
        lines.append({"source": str(path), "target": "一丁丂",
                      "source_len": n, "target_len": 3, "key": f"u{i}"})
    with open(tmp_path / "data.jsonl", "w") as f:
        for line in lines:
            f.write(json.dumps(line, ensure_ascii=False) + "\n")
    return tmp_path


def _tok():
    from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer
    return CharTokenizer(token_list=list(TOKENS))


def test_vicuna_dataset(jsonl_dir):
    from funasr_tpu.register import tables
    ds = tables.dataset_classes["AudioLLMVicunaDataset"](
        index_ds="IndexDSJsonl",
        index_ds_conf={"path": str(jsonl_dir / "data.jsonl")},
        tokenizer=_tok())
    item = ds[0]
    assert len(item["input_ids"]) == len(item["labels_ids"])
    # prompt span masked, target supervised
    n_prompt = len(item["prompt_ids"])
    assert all(l == -100 for l in item["labels_ids"][:n_prompt])
    assert list(item["labels_ids"][n_prompt:]) == list(item["text"])


def test_qwenaudio_dataset(jsonl_dir):
    from funasr_tpu.register import tables
    ds = tables.dataset_classes["AudioLLMQwenAudioDataset"](
        index_ds="IndexDSJsonl",
        index_ds_conf={"path": str(jsonl_dir / "data.jsonl")},
        tokenizer=_tok())
    item = ds[0]
    assert item["fbank_mask"].sum() > 0
    beg = int(item["fbank_beg"][0])
    n_audio = int(item["fbank_mask"].sum())
    assert all(item["input_ids"][beg: beg + n_audio] == 0)
    assert all(l == -100 for l in item["labels_ids"][: beg + n_audio])


def test_openai_multiturn_dataset(jsonl_dir, tmp_path, rng):
    wav_path = tmp_path / "turn.wav"
    _wav(wav_path, rng, 16000)
    row = {"system": ["you transcribe"],
           "user": [f"<|startofspeech|>!{wav_path}<|endofspeech|>"],
           "assistant": ["一丁丂"], "key": "m0",
           "source": str(wav_path), "source_len": 16000,
           "target": "一丁丂", "target_len": 3}
    with open(tmp_path / "chat.jsonl", "w") as f:
        f.write(json.dumps(row, ensure_ascii=False) + "\n")
    from funasr_tpu.register import tables
    ds = tables.dataset_classes["OpenAIDataset"](
        index_ds="IndexDSJsonl",
        index_ds_conf={"path": str(tmp_path / "chat.jsonl")},
        tokenizer=_tok())
    item = ds[0]
    assert item["speech_lengths"] == 16000
    assert len(item["input_ids"]) == len(item["labels_ids"]) \
        == len(item["fbank_mask"])
    n_audio = int(item["fbank_mask"].sum())
    # ~100 fbank frames/s -> conv2d /4 -> adaptor /2 => ~12-13 placeholders
    assert 8 <= n_audio <= 16
    # assistant answer supervised, everything else masked
    sup = [l for l in item["labels_ids"] if l != -100]
    assert len(sup) >= 3
    beg = int(item["fbank_beg"][0])
    assert all(item["fbank_mask"][beg: beg + n_audio] == 1.0)
