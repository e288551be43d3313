"""Inference CLI (counterpart of FunASR ``funasr/bin/inference.py:9-36``):
``python -m funasr_tpu.bin.inference ++model=<dir-or-alias> ++input=audio.wav``."""

from __future__ import annotations

import json
import logging
import sys


def main_cli():
    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.bin.train import parse_overrides

    logging.basicConfig(level=logging.INFO)
    cfg = parse_overrides(sys.argv[1:])
    assert "model" in cfg, "pass ++model=<dir-or-alias>"
    input_data = cfg.pop("input", None)
    assert input_data is not None, "pass ++input=<wav/scp/jsonl>"
    model = AutoModel(**cfg)
    res = model.generate(input=input_data)
    for r in res:
        r.pop("punc_array", None)
        r.pop("spk_embedding", None)
        print(json.dumps(r, ensure_ascii=False, default=str))
    return res


if __name__ == "__main__":
    main_cli()
