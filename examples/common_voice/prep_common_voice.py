#!/usr/bin/env python3
"""Common Voice -> jsonl prep (reference counterpart:
``examples/common_voice/``): reads the CV {split}.tsv + clips/ layout and
writes audio_datasets.jsonl per split for funasr-tpu-train.

Usage: python prep_common_voice.py <cv_root> <out_dir> [--locale en]
"""

import csv
import json
import os
import sys


def main():
    cv_root, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "dev", "test"):
        tsv = os.path.join(cv_root, f"{split}.tsv")
        if not os.path.exists(tsv):
            print(f"skip missing {tsv}", file=sys.stderr)
            continue
        n = 0
        out_path = os.path.join(out_dir, f"{split}.jsonl")
        with open(tsv, encoding="utf-8") as f, \
                open(out_path, "w", encoding="utf-8") as out:
            for row in csv.DictReader(f, delimiter="\t"):
                path = os.path.join(cv_root, "clips", row["path"])
                text = (row.get("sentence") or "").strip()
                if not text:
                    continue
                out.write(json.dumps({
                    "key": os.path.splitext(row["path"])[0],
                    "source": path, "source_len": -1,
                    "target": text, "target_len": len(text),
                }, ensure_ascii=False) + "\n")
                n += 1
        print(f"{split}: {n} -> {out_path}")


if __name__ == "__main__":
    main()
