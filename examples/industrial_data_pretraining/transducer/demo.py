#!/usr/bin/env python3
"""BAT transducer: offline greedy decode (streaming variant available).

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/transducer/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL",
                                       "iic/speech_bat_asr-zh-cn-16k-aishell1-vocab4234-pytorch"))

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"
res = model.generate(input=wav)
print(res)
