#!/usr/bin/env python3
"""Monotonic aligner (fa-zh): predict per-token timestamps for audio+text.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/monotonic_aligner/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL",
                                       "iic/speech_timestamp_prediction-v1-16k-offline"))

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"
text = sys.argv[2] if len(sys.argv) > 2 else "欢迎大家来体验达摩院推出的语音识别模型"
res = model.generate(input=(wav, text), data_type=("sound", "text"))
print(res)
