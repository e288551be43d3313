#!/usr/bin/env python3
"""Real-checkpoint test: streaming Paraformer 600 ms chunks."""
import sys

from _common import example_wav, finish, require_cache_or_network


def main():
    require_cache_or_network("paraformer-zh-streaming")
    import numpy as np

    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.utils.load_utils import load_audio

    model = AutoModel(model="paraformer-zh-streaming", disable_pbar=True)
    speech = np.asarray(load_audio(example_wav()), np.float32)
    chunk_size = [0, 10, 5]  # 600 ms
    stride = chunk_size[1] * 960
    cache = {}
    text = ""
    n = max(len(speech) // stride, 1)
    for i in range(n):
        chunk = speech[i * stride:(i + 1) * stride]
        res = model.generate(input=chunk, cache=cache, is_final=i == n - 1,
                             chunk_size=chunk_size,
                             encoder_chunk_look_back=4,
                             decoder_chunk_look_back=1)
        if res:
            text += res[0].get("text", "")
    print(f"[ParaformerStreaming] text: {text}")
    return finish("ParaformerStreaming", True, f"({len(text)} chars)")


if __name__ == "__main__":
    sys.exit(main())
