"""Benchmark harness: speed (RTFx) + accuracy (CER/WER) over an audio set.

Counterpart of the reference harness (FunASR ``benchmark_vllm.py`` CLI with
``--audio-dir/--label-json``; RTFx definition per
``docs/benchmark/rtf_reproducibility.md:8-28``: audio_seconds / processing_seconds).

Usage:
    python -m funasr_tpu.bin.benchmark ++model=<dir-or-alias> \
        ++audio_dir=wavs/ ++label_json=labels.json [++vad_model=...] \
        [++batch_size_s=300] [++warmup=1] [++language=zh]

label_json: {"utt_id_or_filename": "reference text", ...}
"""

from __future__ import annotations

import glob
import json
import logging
import os
import sys
import time


def run_benchmark(model, audio_files, labels=None, warmup: int = 1, **cfg):
    from funasr_tpu.metrics.wer import compute_cer
    from funasr_tpu.utils.load_utils import load_audio

    total_audio_s = 0.0
    for f in audio_files:
        total_audio_s += len(load_audio(f)) / 16000.0

    # warmup compiles
    for _ in range(warmup):
        model.generate(input=audio_files[0], **cfg)

    t0 = time.perf_counter()
    results = []
    for f in audio_files:
        res = model.generate(input=f, **cfg)
        results.append((f, res[0].get("text", "") if res else ""))
    wall = time.perf_counter() - t0
    rtfx = total_audio_s / wall

    report = {"n_files": len(audio_files), "audio_seconds": round(total_audio_s, 1),
              "wall_seconds": round(wall, 2), "rtfx": round(rtfx, 1)}
    if labels:
        refs, hyps = [], []
        for f, hyp in results:
            key = os.path.splitext(os.path.basename(f))[0]
            ref = labels.get(key) or labels.get(os.path.basename(f))
            if ref is not None:
                refs.append(ref)
                hyps.append(hyp)
        if refs:
            cer = compute_cer(refs, hyps)
            report.update(cer=round(cer["cer"] * 100, 2),
                          sub=round(cer["sub"] * 100, 2),
                          dele=round(cer["del"] * 100, 2),
                          ins=round(cer["ins"] * 100, 2),
                          n_scored=len(refs))
    return report, results


def main_cli():
    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.bin.train import parse_overrides

    logging.basicConfig(level=logging.INFO)
    cfg = parse_overrides(sys.argv[1:])
    audio_dir = cfg.pop("audio_dir", None)
    label_json = cfg.pop("label_json", None)
    warmup = int(cfg.pop("warmup", 1))
    assert "model" in cfg and audio_dir, __doc__

    files = sorted(glob.glob(os.path.join(audio_dir, "*.wav"))
                   + glob.glob(os.path.join(audio_dir, "*.pcm")))
    assert files, f"no audio in {audio_dir}"
    labels = None
    if label_json:
        with open(label_json, encoding="utf-8") as f:
            labels = json.load(f)

    model_keys = {"model", "vad_model", "punc_model", "spk_model", "hub",
                  "disable_pbar", "batch_size", "device"}
    model = AutoModel(**{k: v for k, v in cfg.items() if k in model_keys},
                      disable_pbar=True)
    run_cfg = {k: v for k, v in cfg.items() if k not in model_keys}
    report, _ = run_benchmark(model, files, labels, warmup=warmup, **run_cfg)
    print(json.dumps(report, ensure_ascii=False))


if __name__ == "__main__":
    main_cli()
