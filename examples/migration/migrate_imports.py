#!/usr/bin/env python3
"""Rewrite FunASR imports to funasr_tpu in a source tree (conservative:
only exact `funasr` module references).

Usage: python migrate_imports.py <dir> [--apply]
"""

import os
import re
import sys

PATTERNS = [
    (re.compile(r"\bfrom funasr(\.[\w.]+)? import"), "from funasr_tpu\\1 import"),
    (re.compile(r"\bimport funasr\b(?!_tpu)"), "import funasr_tpu as funasr"),
]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    apply = "--apply" in sys.argv
    changed = 0
    for dirpath, _dirs, files in os.walk(root):
        for name in files:
            if not name.endswith(".py"):
                continue
            path = os.path.join(dirpath, name)
            with open(path, encoding="utf-8") as f:
                src = f.read()
            out = src
            for pat, rep in PATTERNS:
                out = pat.sub(rep, out)
            if out != src:
                changed += 1
                print(("rewriting " if apply else "would rewrite ") + path)
                if apply:
                    with open(path, "w", encoding="utf-8") as f:
                        f.write(out)
    print(f"{changed} files{'' if apply else ' (dry run; pass --apply)'}")


if __name__ == "__main__":
    main()
