#!/usr/bin/env python3
"""GLM-ASR-Nano: audio-conditioned GLM decoder.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/glm_asr/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL",
                                       "zai-org/GLM-ASR-Nano-2512"))

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"
res = model.generate(input=wav)
print(res)
