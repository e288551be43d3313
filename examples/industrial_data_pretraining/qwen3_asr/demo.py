#!/usr/bin/env python3
"""Qwen3-ASR: instruction-following ASR with optional context biasing.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/qwen3_asr/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL",
                                       "Qwen/Qwen3-ASR-1.7B"))

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"
res = model.generate(input=wav, context="达摩院, 魔搭")
print(res)
