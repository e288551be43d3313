#!/usr/bin/env python3
"""Real-checkpoint test: Paraformer-large full pipeline (VAD+ASR+PUNC).
Counterpart of reference tests_models/test_paraformer.py:11-35."""
import sys
import time

from _common import example_wav, finish, require_cache_or_network


def main():
    require_cache_or_network("paraformer-zh / fsmn-vad / ct-punc")
    from funasr_tpu.auto.auto_model import AutoModel

    t0 = time.time()
    model = AutoModel(model="paraformer-zh", vad_model="fsmn-vad",
                      vad_kwargs={"max_single_segment_time": 60000},
                      punc_model="ct-punc-c", disable_pbar=True)
    print(f"[Paraformer] loaded in {time.time() - t0:.1f}s")
    res = model.generate(input=example_wav(), cache={})
    print(f"[Paraformer] result: {res}")
    return finish("Paraformer", bool(res and res[0].get("text", "").strip()))


if __name__ == "__main__":
    sys.exit(main())
