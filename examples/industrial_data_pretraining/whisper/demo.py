#!/usr/bin/env python3
"""Whisper-large-v3: multilingual transcription with language detection.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/whisper/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL",
                                       "Whisper-large-v3"),
                  vad_model=os.environ.get("FUNASR_TPU_DEMO_VAD", "fsmn-vad") or None)

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_en.wav"
res = model.generate(input=wav, language=None, task="transcribe",
                     batch_size_s=0)
print(res)
