#!/usr/bin/env python3
"""FSMN-VAD: offline segments and 200 ms streaming open/close events.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/fsmn_vad_streaming/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


import numpy as np

from funasr_tpu.utils.load_utils import load_audio

model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL",
                                       "iic/speech_fsmn_vad_zh-cn-16k-common-pytorch"))

wav = sys.argv[1] if len(sys.argv) > 1 else "vad_example.wav"
print(model.generate(input=wav))  # [[beg_ms, end_ms], ...]

# streaming: feed 200 ms chunks, get incremental [beg,-1]/[-1,end] events
speech = load_audio(wav)
chunk_ms = 200
stride = chunk_ms * 16
cache = {}
n_chunks = int(np.ceil(len(speech) / stride))
for i in range(n_chunks):
    chunk = speech[i * stride:(i + 1) * stride]
    res = model.generate(input=chunk, cache=cache, is_final=i == n_chunks - 1,
                         chunk_size=chunk_ms, disable_pbar=True)
    if res[0]["value"]:
        print(res[0]["value"])
