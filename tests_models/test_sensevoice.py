#!/usr/bin/env python3
"""Real-checkpoint test: SenseVoiceSmall rich transcription."""
import sys

from _common import example_wav, finish, require_cache_or_network


def main():
    require_cache_or_network("sensevoice-small")
    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.utils.postprocess_utils import rich_transcription_postprocess

    model = AutoModel(model="sensevoice-small", disable_pbar=True)
    res = model.generate(input=example_wav(), language="auto", use_itn=True)
    print(f"[SenseVoice] result: {res}")
    ok = bool(res)
    if ok:
        print("[SenseVoice] clean:", rich_transcription_postprocess(
            res[0].get("text", "")))
    return finish("SenseVoice", ok)


if __name__ == "__main__":
    sys.exit(main())
