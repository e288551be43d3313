#!/usr/bin/env python3
"""LLM-ASR: speech encoder + adaptor + LLM decoder, multiturn-capable.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/llm_asr/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL", "llm-asr"),
                  vad_model=os.environ.get("FUNASR_TPU_DEMO_VAD", "fsmn-vad") or None)

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"
res = model.generate(input=wav, prompt="Transcribe the speech.")
print(res)

# multiturn conversations with inline audio spans (OpenAI message format):
# res = model.generate(input=[{"role": "user", "content": [
#     {"type": "audio", "audio": wav},
#     {"type": "text", "text": "What did the speaker say?"}]}])
