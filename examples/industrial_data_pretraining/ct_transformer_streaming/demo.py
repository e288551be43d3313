#!/usr/bin/env python3
"""Streaming punctuation: incremental calls share a cache across VAD segments.

funasr_tpu counterpart of the reference
``examples/industrial_data_pretraining/ct_transformer_streaming/demo.py``. Model ids resolve
through the hub alias/download layer (``funasr_tpu/download/``); set
``FUNASR_TPU_DEMO_MODEL`` to a local model dir to run offline, and pass an
audio path as the first CLI argument.
"""

import os
import sys

from funasr_tpu import AutoModel


model = AutoModel(model=os.environ.get("FUNASR_TPU_DEMO_MODEL",
                                       "iic/punc_ct-transformer_zh-cn-common-vad_realtime-vocab272727"))

inputs = "跨境河流是养育沿岸|人民的生命之源长期以来为帮助下游地区防灾减灾中方技术人员|在上游地区极为恶劣的自然条件下克服巨大困难甚至冒着生命危险|向印方提供汛期水文资料处理紧急事件中方重视印方在跨境河流>问题上的关切|愿意进一步完善双方联合工作机制|凡是|中方能做的我们|都会去做而且会做得更好我请印度朋友们放心中国在上游的|任何开发利用都会经过科学|规划和论证兼顾上下游的利益"

cache = {}
for chunk in inputs.split("|"):
    res = model.generate(input=chunk, cache=cache, disable_pbar=True)
    print(res)
