#!/usr/bin/env python3
"""ERes2NetV2 speaker embedding (and diarization-enabled pipeline).

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/eres2netv2_sv/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL",
                                       "iic/speech_eres2netv2_sv_zh-cn_16k-common"))

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"
res = model.generate(input=wav)
print(res[0]["spk_embedding"].shape)

# full pipeline with speaker-attributed sentences:
#   AutoModel(model="paraformer-zh", vad_model="fsmn-vad",
#             punc_model="ct-punc-c", spk_model="iic/speech_eres2netv2_sv_zh-cn_16k-common")
