#!/usr/bin/env python3
"""SenseVoice-Small: multilingual ASR + LID + emotion/event tags + ITN.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/sense_voice/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


from funasr_tpu.utils.postprocess_utils import rich_transcription_postprocess

model = AutoModel(
    model=os.environ.get("FUNASR_TPU_DEMO_MODEL", "iic/SenseVoiceSmall"),
    vad_model=os.environ.get("FUNASR_TPU_DEMO_VAD", "fsmn-vad") or None,
    vad_kwargs={"max_single_segment_time": 30000},
)

wav = sys.argv[1] if len(sys.argv) > 1 else "sense_voice_example.mp3"
res = model.generate(input=wav, language="auto", use_itn=True,
                     batch_size_s=60, merge_vad=True, merge_length_s=15)
print(rich_transcription_postprocess(res[0]["text"]))
