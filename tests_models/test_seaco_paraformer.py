#!/usr/bin/env python3
"""Real-checkpoint test: SeACo-Paraformer hotword biasing."""
import sys

from _common import example_wav, finish, require_cache_or_network


def main():
    require_cache_or_network("iic/speech_seaco_paraformer_large...")
    from funasr_tpu.auto.auto_model import AutoModel

    model = AutoModel(
        model="iic/speech_seaco_paraformer_large_asr_nat-zh-cn-16k-common-vocab8404-pytorch",
        disable_pbar=True)
    res = model.generate(input=example_wav(), hotword="魔搭")
    print(f"[SeACo] result: {res}")
    return finish("SeACo", bool(res))


if __name__ == "__main__":
    sys.exit(main())
