#!/usr/bin/env python3
"""SANM KWS: offline command-word spotting.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/sanm_kws/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL",
                                       "iic/speech_sanm_kws_phone-xiaoyun-commands-offline"))

wav = sys.argv[1] if len(sys.argv) > 1 else "kws_example.wav"
res = model.generate(input=wav, keywords="小云小云")
print(res)
