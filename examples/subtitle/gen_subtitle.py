#!/usr/bin/env python3
"""Generate .srt / .vtt subtitles from an audio (or demuxable video) file:
VAD -> ASR -> punctuation -> sentence timestamps -> srt. funasr_tpu
counterpart of the reference ``examples/subtitle/``.

Usage: python gen_subtitle.py input.wav [out.srt]
Env:   FUNASR_TPU_DEMO_MODEL / _VAD / _PUNC to run with local model dirs.
"""

import os
import sys

from funasr_tpu import AutoModel


def fmt_ts(ms: float, sep: str = ",") -> str:
    ms = int(ms)
    h, rem = divmod(ms, 3600000)
    m, rem = divmod(rem, 60000)
    s, ms = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{ms:03d}"


def to_srt(sentences) -> str:
    lines = []
    for i, sent in enumerate(sentences, 1):
        beg, end = sent["start"], sent["end"]
        lines += [str(i), f"{fmt_ts(beg)} --> {fmt_ts(end)}", sent["text"], ""]
    return "\n".join(lines)


def main():
    wav = sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.splitext(wav)[0] + ".srt"

    model = AutoModel(
        model=os.environ.get("FUNASR_TPU_DEMO_MODEL", "paraformer-zh"),
        vad_model=os.environ.get("FUNASR_TPU_DEMO_VAD", "fsmn-vad") or None,
        punc_model=os.environ.get("FUNASR_TPU_DEMO_PUNC", "ct-punc-c") or None,
    )
    res = model.generate(input=wav, batch_size_s=300, sentence_timestamp=True)
    sentences = res[0].get("sentence_info") or []
    if not sentences:
        # no sentence segmentation available: one block over the whole clip
        ts = res[0].get("timestamp") or [[0, 1000]]
        sentences = [{"start": ts[0][0], "end": ts[-1][1],
                      "text": res[0]["text"]}]
    with open(out, "w", encoding="utf-8") as f:
        f.write(to_srt(sentences) + "\n")
    print(f"wrote {len(sentences)} cues -> {out}")


if __name__ == "__main__":
    main()
