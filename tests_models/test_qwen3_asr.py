#!/usr/bin/env python3
"""Real-checkpoint test: Qwen3-ASR LLM-based ASR (reference
tests_models/test_qwen3_asr.py:18)."""
import sys

from _common import example_wav, finish, require_cache_or_network


def main():
    require_cache_or_network("Qwen/Qwen3-ASR-1.7B")
    from funasr_tpu.auto.auto_model import AutoModel

    model = AutoModel(model="qwen3-asr", hub="hf", disable_pbar=True)
    res = model.generate(input=[example_wav()], batch_size=1)
    print(f"[Qwen3-ASR] result: {res}")
    ok = bool(res) and isinstance(res[0].get("text"), str)
    return finish("Qwen3-ASR", ok)


if __name__ == "__main__":
    sys.exit(main())
