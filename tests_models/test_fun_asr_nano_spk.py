#!/usr/bin/env python3
"""Real-checkpoint test: Fun-ASR-Nano + VAD + CAM++ speaker diarization
(reference tests_models/test_fun_asr_nano_spk.py:11-40)."""
import sys

from _common import example_wav, finish, require_cache_or_network


def main():
    require_cache_or_network("fun-asr-nano + fsmn-vad + cam++")
    from funasr_tpu.auto.auto_model import AutoModel

    model = AutoModel(
        model="fun-asr-nano", hub="hf",
        vad_model="fsmn-vad",
        vad_kwargs={"max_single_segment_time": 30000},
        spk_model="cam++",
        disable_pbar=True)
    res = model.generate(input=[example_wav()], batch_size=1, language="中文")
    print(f"[Fun-ASR-Nano-SPK] result keys: {[list(r) for r in res]}")
    ok = bool(res) and isinstance(res[0].get("text"), str)
    if res and "sentence_info" in res[0]:
        ok = ok and all("spk" in s for s in res[0]["sentence_info"])
    return finish("Fun-ASR-Nano-SPK", ok)


if __name__ == "__main__":
    sys.exit(main())
