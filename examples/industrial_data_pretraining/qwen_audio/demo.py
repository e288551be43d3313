#!/usr/bin/env python3
"""Qwen-Audio: multi-task audio understanding prompts.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/qwen_audio/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL", "Qwen-Audio"))

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"
prompt = "<|startoftranscript|><|zh|><|transcribe|><|zh|><|notimestamps|><|wo_itn|>"
res = model.generate(input=wav, prompt=prompt)
print(res)
