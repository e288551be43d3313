#!/usr/bin/env python3
"""Real-checkpoint test: SenseVoice + VAD + CAM++ speaker diarization with
merge_vad (reference tests_models/test_sensevoice_spk.py:13-30)."""
import sys

from _common import example_wav, finish, require_cache_or_network


def main():
    require_cache_or_network("sensevoice-small + fsmn-vad + cam++")
    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.utils.postprocess_utils import (
        rich_transcription_postprocess)

    model = AutoModel(
        model="sensevoice-small",
        vad_model="fsmn-vad",
        vad_kwargs={"max_single_segment_time": 30000},
        spk_model="cam++",
        disable_pbar=True)
    res = model.generate(input=example_wav(), language="auto", use_itn=True,
                         batch_size_s=60, merge_vad=True, merge_length_s=15)
    print(f"[SenseVoice-SPK] result keys: {[list(r) for r in res]}")
    ok = bool(res) and isinstance(res[0].get("text"), str)
    if ok:
        clean = rich_transcription_postprocess(res[0]["text"])
        print(f"[SenseVoice-SPK] text: {clean}")
    return finish("SenseVoice-SPK", ok)


if __name__ == "__main__":
    sys.exit(main())
