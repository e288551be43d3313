#!/usr/bin/env python3
"""CT-Transformer punctuation restoration on raw text.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/ct_transformer/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL",
                                       "iic/punc_ct-transformer_zh-cn-common-vocab272727-pytorch"))

text = sys.argv[1] if len(sys.argv) > 1 else \
    "那今天的会就到这里吧 happy new year 明年见"
res = model.generate(input=text)
print(res)
