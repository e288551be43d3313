#!/usr/bin/env python3
"""Pure-CTC acoustic model: greedy decoding.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/ctc/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL", "ctc-zh"))

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"
res = model.generate(input=wav)
print(res)
