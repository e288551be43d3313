#!/usr/bin/env python3
"""Streaming Paraformer: 600 ms chunks with encoder/decoder lookback caches.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/paraformer_streaming/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


import numpy as np

from funasr_tpu.utils.load_utils import load_audio

chunk_size = [0, 10, 5]           # 600 ms chunks, 5-frame lookahead
encoder_chunk_look_back = 4
decoder_chunk_look_back = 1

model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL",
                                       "iic/speech_paraformer_asr_nat-zh-cn-16k-common-vocab8404-online"))

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"
speech = load_audio(wav)
chunk_stride = chunk_size[1] * 960  # 60 ms frames x 16 kHz

cache = {}
n_chunks = int(np.ceil(len(speech) / chunk_stride))
for i in range(n_chunks):
    chunk = speech[i * chunk_stride:(i + 1) * chunk_stride]
    res = model.generate(input=chunk, cache=cache,
                         is_final=i == n_chunks - 1, chunk_size=chunk_size,
                         encoder_chunk_look_back=encoder_chunk_look_back,
                         decoder_chunk_look_back=decoder_chunk_look_back,
                         disable_pbar=True)
    print(res[0]["text"], end="", flush=True)
print()
