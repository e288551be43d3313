"""Per-model-family dataset variants (counterparts of FunASR
``funasr/datasets/{sense_voice_datasets,llm_datasets,kws_datasets,...}``).

All specialize :class:`funasr_tpu.datasets.audio_datasets.datasets.AudioDataset`
with family-specific target construction; the bucketed collator is shared.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from funasr_tpu.datasets.audio_datasets.datasets import AudioDataset
from funasr_tpu.register import tables


@tables.register("dataset_classes", "SenseVoiceDataset")
class SenseVoiceDataset(AudioDataset):
    """Targets prepend 4 rich-tag ids [lid, event, emo, textnorm] before the text
    tokens (the prompt positions trained with CE, ``sense_voice/model.py:767-815``).

    jsonl lines may carry "lid"/"emo"/"event"/"with_itn" fields; defaults: zh /
    Speech / NEUTRAL / woitn token ids supplied via ``tag_ids_conf``.
    """

    DEFAULT_TAGS = {"lid": 3, "event": 1, "emo": 2, "textnorm": 15}

    def __init__(self, *args, tag_ids_conf: Optional[Dict] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.tag_defaults = {**self.DEFAULT_TAGS, **(tag_ids_conf or {})}

    def __getitem__(self, idx: int):
        item = super().__getitem__(idx)
        meta = self.index_ds[idx]
        tags = [int(meta.get("lid", self.tag_defaults["lid"])),
                int(meta.get("event", self.tag_defaults["event"])),
                int(meta.get("emo", self.tag_defaults["emo"])),
                int(meta.get("textnorm", self.tag_defaults["textnorm"]))]
        item["text"] = np.concatenate([np.asarray(tags, np.int32), item["text"]])
        item["text_lengths"] = item["text_lengths"] + 4
        return item


@tables.register("dataset_classes", "AudioDatasetHotword")
class AudioDatasetHotword(AudioDataset):
    """SeACo training: sample hotword spans from the target per item
    (reference ``datasets.py:155``). Adds hotword_pad/hotword_lengths/seaco_label."""

    def __init__(self, *args, hotword_min_length: int = 2,
                 hotword_max_length: int = 8, sample_rate: float = 0.75, **kwargs):
        super().__init__(*args, **kwargs)
        self.hw_min = hotword_min_length
        self.hw_max = hotword_max_length
        self.hw_rate = sample_rate

    def __getitem__(self, idx: int):
        item = super().__getitem__(idx)
        text = item["text"]
        n = len(text)
        rng = self._rng
        if n >= self.hw_min and rng.random() < self.hw_rate:
            span = int(rng.integers(self.hw_min, min(self.hw_max, n) + 1))
            start = int(rng.integers(0, n - span + 1))
            item["hotword"] = text[start: start + span].copy()
        else:
            item["hotword"] = np.asarray([1], np.int32)  # <s> = no-bias
        return item


@tables.register("dataset_classes", "KWSDataset")
class KWSDataset(AudioDataset):
    """Keyword spotting: jsonl "target" may carry the keyword transcription; items
    gain a binary "is_keyword" flag from the "label" field."""

    def __getitem__(self, idx: int):
        item = super().__getitem__(idx)
        item["is_keyword"] = int(self.index_ds[idx].get("label", 1))
        return item


@tables.register("dataset_classes", "LLMDataset")
@tables.register("dataset_classes", "OpenAIDataset")
class LLMDataset(AudioDataset):
    """LLM-ASR training items: raw waveform + prompt/target token ids (ChatML
    construction happens in the model; reference ``llm_datasets/``)."""

    def __init__(self, *args, prompt_field: str = "prompt", **kwargs):
        super().__init__(*args, **kwargs)
        self.prompt_field = prompt_field

    def __getitem__(self, idx: int):
        item = super().__getitem__(idx)
        prompt = self.index_ds[idx].get(self.prompt_field, "")
        if self.tokenizer is not None and prompt:
            item["prompt_ids"] = np.asarray(self.tokenizer.encode(prompt), np.int32)
        else:
            item["prompt_ids"] = np.zeros((0,), np.int32)
        return item
