#!/usr/bin/env python3
"""emotion2vec: speech emotion representation + 9-class recognition.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/emotion2vec/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL",
                                       "iic/emotion2vec_plus_large"))

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"
res = model.generate(input=wav, granularity="utterance",
                     extract_embedding=True)
print(res[0].get("labels"), res[0].get("scores"))
