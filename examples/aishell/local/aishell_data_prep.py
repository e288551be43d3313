#!/usr/bin/env python3
"""AISHELL-1 data preparation (counterpart of the reference's
``examples/aishell/*/local/aishell_data_prep.sh``, reimplemented in python).

Walks the extracted AISHELL-1 layout::

    <wav_dir>/{train,dev,test}/SXXXX/*.wav
    <transcript_dir>/aishell_transcript_v0.8.txt   (utt_id<space>text)

and writes Kaldi-style ``wav.scp`` + ``text`` per split under
``<out_dir>/data/{train,dev,test}/``, with transcript whitespace stripped
(AISHELL text is space-separated words; zh char models train on the joined
string — same normalization the reference recipe applies with ``tr -d " "``).

Usage:
    python local/aishell_data_prep.py <wav_dir> <transcript_path> <out_dir>
"""

import os
import sys


def prepare(wav_dir: str, transcript_path: str, out_dir: str) -> None:
    transcripts = {}
    with open(transcript_path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if len(parts) == 2:
                transcripts[parts[0]] = parts[1].replace(" ", "")

    n_total = 0
    for split in ("train", "dev", "test"):
        split_dir = os.path.join(wav_dir, split)
        if not os.path.isdir(split_dir):
            print(f"skip missing split {split_dir}", file=sys.stderr)
            continue
        pairs = []
        for root, _dirs, files in os.walk(split_dir):
            for name in sorted(files):
                if not name.endswith(".wav"):
                    continue
                utt = name[: -len(".wav")]
                if utt not in transcripts:
                    continue  # reference recipe also drops untranscribed utts
                pairs.append((utt, os.path.abspath(os.path.join(root, name))))
        pairs.sort()
        ddir = os.path.join(out_dir, "data", split)
        os.makedirs(ddir, exist_ok=True)
        with open(os.path.join(ddir, "wav.scp"), "w", encoding="utf-8") as f:
            f.writelines(f"{u} {p}\n" for u, p in pairs)
        with open(os.path.join(ddir, "text"), "w", encoding="utf-8") as f:
            f.writelines(f"{u} {transcripts[u]}\n" for u, _ in pairs)
        print(f"{split}: {len(pairs)} utterances")
        n_total += len(pairs)
    if n_total == 0:
        raise SystemExit(f"no transcribed wavs found under {wav_dir}")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        raise SystemExit(__doc__)
    prepare(sys.argv[1], sys.argv[2], sys.argv[3])
