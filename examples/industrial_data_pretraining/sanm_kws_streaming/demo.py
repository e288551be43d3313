#!/usr/bin/env python3
"""Streaming SANM KWS over chunked audio.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/sanm_kws_streaming/demo.py``. Model ids resolve
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
                                       "iic/speech_sanm_kws_phone-xiaoyun-commands-online"))

wav = sys.argv[1] if len(sys.argv) > 1 else "kws_example.wav"
speech = load_audio(wav)
stride = 960 * 10
cache = {}
n_chunks = int(np.ceil(len(speech) / stride))
for i in range(n_chunks):
    res = model.generate(input=speech[i * stride:(i + 1) * stride],
                         cache=cache, is_final=i == n_chunks - 1,
                         keywords="小云小云", disable_pbar=True)
    if res and res[0].get("text"):
        print(res)
