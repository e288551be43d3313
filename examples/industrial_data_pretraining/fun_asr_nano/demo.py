#!/usr/bin/env python3
"""Fun-ASR-Nano: LLM-based ASR through the TPU LLM engine (vLLM role).

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/fun_asr_nano/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


from funasr_tpu.auto.auto_model_vllm import AutoModelVLLM

model_id = os.environ.get("FUNASR_TPU_DEMO_MODEL", "FunAudioLLM/Fun-ASR-Nano-2512")
wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"

# batch/offline serving engine (continuous batching, chunked prefill)
model = AutoModelVLLM(model=model_id)
res = model.generate(input=wav)
print(res)

# or token-streaming:
for piece in model.streaming_generate(input=wav):
    print(piece, end="", flush=True)
print()
