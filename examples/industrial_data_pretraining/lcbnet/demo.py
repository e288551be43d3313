#!/usr/bin/env python3
"""LCB-Net: audio-visual ASR biased by OCR text from slides.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/lcbnet/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL", "iic/LCB-NET"))

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_en.wav"
ocr = sys.argv[2] if len(sys.argv) > 2 else "intelligent speech recognition"
res = model.generate(input=wav, ocr_text=ocr)
print(res)
