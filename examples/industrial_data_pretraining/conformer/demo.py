#!/usr/bin/env python3
"""Conformer AED offline decoding.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/conformer/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL",
                                       "iic/speech_conformer_asr_nat-zh-cn-16k-aishell2-vocab5212-pytorch"))

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"
res = model.generate(input=wav, beam_size=5)
print(res)
