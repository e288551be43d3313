#!/usr/bin/env python3
"""BiCif-Paraformer: ASR with per-token and sentence timestamps.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/bicif_paraformer/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(
    model=os.environ.get("FUNASR_TPU_DEMO_MODEL",
                         "iic/speech_paraformer-large-vad-punc_asr_nat-zh-cn-16k-common-vocab8404-pytorch"),
    vad_model=os.environ.get("FUNASR_TPU_DEMO_VAD", "fsmn-vad") or None,
    punc_model=os.environ.get("FUNASR_TPU_DEMO_PUNC", "ct-punc-c") or None,
)

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"
res = model.generate(input=wav, batch_size_s=300, sentence_timestamp=True)
print(res)  # each result carries "timestamp" [[start_ms, end_ms], ...]
