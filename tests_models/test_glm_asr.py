#!/usr/bin/env python3
"""Real-checkpoint test: GLM-ASR-Nano LLM-based ASR (reference
tests_models/test_glm_asr.py:18)."""
import sys

from _common import example_wav, finish, require_cache_or_network


def main():
    require_cache_or_network("zai-org/GLM-ASR-Nano-2512")
    from funasr_tpu.auto.auto_model import AutoModel

    model = AutoModel(model="glm-asr-nano", hub="hf", disable_pbar=True)
    res = model.generate(input=[example_wav()], batch_size=1)
    print(f"[GLM-ASR] result: {res}")
    ok = bool(res) and isinstance(res[0].get("text"), str)
    return finish("GLM-ASR", ok)


if __name__ == "__main__":
    sys.exit(main())
