#!/usr/bin/env python3
"""Real-checkpoint test: ERes2NetV2 speaker verification — standalone
embedding plus use as the spk_model in the full diarization pipeline
(reference tests_models/test_eres2netv2.py:16-50)."""
import sys

from _common import example_wav, finish, require_cache_or_network


def main():
    require_cache_or_network("eres2netv2")
    from funasr_tpu.auto.auto_model import AutoModel

    model = AutoModel(model="eres2netv2", disable_pbar=True)
    res = model.generate(input=example_wav())
    print(f"[ERes2NetV2] standalone result keys: {[list(r) for r in res]}")
    ok = bool(res) and any(k in res[0] for k in ("spk_embedding", "embedding",
                                                 "value", "text"))

    pipeline = AutoModel(
        model="paraformer-zh",
        vad_model="fsmn-vad",
        punc_model="ct-punc-c",
        spk_model="eres2netv2",
        disable_pbar=True)
    pres = pipeline.generate(input=example_wav(), batch_size_s=300)
    print(f"[ERes2NetV2] pipeline result keys: {[list(r) for r in pres]}")
    ok = ok and bool(pres) and "text" in pres[0]
    if pres and "sentence_info" in pres[0]:
        ok = ok and all("spk" in s for s in pres[0]["sentence_info"])
    return finish("ERes2NetV2", ok)


if __name__ == "__main__":
    sys.exit(main())
