#!/usr/bin/env python3
"""Real-checkpoint test: FSMN-VAD segmentation."""
import sys

from _common import example_wav, finish, require_cache_or_network


def main():
    require_cache_or_network("fsmn-vad")
    from funasr_tpu.auto.auto_model import AutoModel

    model = AutoModel(model="fsmn-vad", disable_pbar=True)
    res = model.generate(input=example_wav())
    print(f"[FSMN-VAD] result: {res}")
    return finish("FSMN-VAD", bool(res and isinstance(res[0].get("value"), list)))


if __name__ == "__main__":
    sys.exit(main())
