#!/usr/bin/env python3
"""Use funasr_tpu as a LangChain tool / OpenAI function (reference
counterpart: ``examples/langchain/``)."""

import os
import sys

from funasr_tpu.integrations.langchain_tool import FunASRTool

tool = FunASRTool(model=os.environ.get("FUNASR_TPU_DEMO_MODEL", "paraformer-zh"))

wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"

# direct call
print(tool.run(wav))

# as a LangChain Tool object (requires langchain installed)
try:
    lc_tool = tool.as_langchain_tool()
    print(lc_tool.name, "->", lc_tool.run(wav))
except ImportError:
    print("langchain not installed; showing the OpenAI function schema instead:")
    print(tool.as_openai_function())
