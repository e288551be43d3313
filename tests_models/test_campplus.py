#!/usr/bin/env python3
"""Real-checkpoint test: CAM++ speaker embedding."""
import sys

from _common import example_wav, finish, require_cache_or_network


def main():
    require_cache_or_network("cam++")
    from funasr_tpu.auto.auto_model import AutoModel

    model = AutoModel(model="cam++", disable_pbar=True)
    res = model.generate(input=example_wav())
    print(f"[CAM++] result keys: {[list(r) for r in res]}")
    ok = bool(res) and any(k in res[0] for k in ("spk_embedding", "embedding",
                                                 "value", "text"))
    return finish("CAM++", ok)


if __name__ == "__main__":
    sys.exit(main())
