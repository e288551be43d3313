#!/usr/bin/env python3
"""Real-checkpoint test: CT-Transformer punctuation restoration."""
import sys

from _common import finish, require_cache_or_network


def main():
    require_cache_or_network("ct-punc")
    from funasr_tpu.auto.auto_model import AutoModel

    model = AutoModel(model="ct-punc-c", disable_pbar=True)
    res = model.generate(input="那今天的会就到这里吧happy new year明年见")
    print(f"[CT-Transformer] result: {res}")
    ok = bool(res and res[0].get("text", "").strip())
    if ok and "。" not in res[0]["text"] and "，" not in res[0]["text"]:
        ok = False
    return finish("CT-Transformer", ok)


if __name__ == "__main__":
    sys.exit(main())
