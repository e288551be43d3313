"""AutoFrontend: standalone fbank extraction API (counterpart of FunASR
``funasr/auto/auto_frontend.py:1-122``)."""

from __future__ import annotations

import logging
import time
from typing import List, Optional

import numpy as np

from funasr_tpu.download.download_model_from_hub import download_model
from funasr_tpu.register import tables
from funasr_tpu.utils.misc import deep_update


class AutoFrontend:
    def __init__(self, **kwargs):
        if "model" in kwargs and "frontend_conf" not in kwargs:
            kwargs = download_model(**kwargs)
        frontend = kwargs.get("frontend", "WavFrontend")
        frontend_class = tables.frontend_classes[frontend]
        self.frontend = frontend_class(**(kwargs.get("frontend_conf") or {}))
        self.kwargs = kwargs

    def __call__(self, input, input_len=None, batch_size: int = 1, key=None,
                 **cfg):
        from funasr_tpu.auto.auto_model import prepare_data_iterator
        from funasr_tpu.utils.load_utils import load_audio_text_image_video

        deep_update(self.kwargs, cfg)
        key_list, data_list = prepare_data_iterator(input, key=key)
        results = []
        for beg in range(0, len(data_list), batch_size):
            batch = data_list[beg: beg + batch_size]
            t0 = time.perf_counter()
            audio = load_audio_text_image_video(
                batch, fs=self.frontend.fs, audio_fs=cfg.get("fs", 16000))
            if not getattr(self.frontend, "supports_pcm16", False):
                from funasr_tpu.utils.load_utils import as_unit_f32
                audio = [as_unit_f32(a) for a in audio]
            feats, feat_lens = self.frontend.extract(audio)
            logging.debug("extract %d clips in %.3fs", len(batch),
                          time.perf_counter() - t0)
            for i in range(len(batch)):
                results.append({"key": key_list[beg + i],
                                "input": feats[i, : feat_lens[i]],
                                "input_len": int(feat_lens[i])})
        return results
