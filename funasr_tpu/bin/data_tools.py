"""Data preparation CLIs (counterparts of FunASR ``scp2jsonl.py``, ``jsonl2scp.py``,
``scp2len.py``, ``funasr/bin/compute_audio_cmvn.py``, ``funasr/bin/tokenize_text.py``).

Usage:
    python -m funasr_tpu.bin.data_tools scp2jsonl ++scp_file_list='["wav.scp","text.txt"]' \
        ++data_type_list='["source","target"]' ++jsonl_file_out=out.jsonl
    python -m funasr_tpu.bin.data_tools jsonl2scp ++jsonl_file_in=in.jsonl ++scp_file_out=...
    python -m funasr_tpu.bin.data_tools compute_cmvn ++jsonl=train.jsonl ++out=am.mvn ++dim=560
"""

from __future__ import annotations

import json
import sys
from typing import List

import numpy as np


def _read_scp(path: str) -> dict:
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if len(parts) == 2:
                out[parts[0]] = parts[1]
    return out


def scp2jsonl(scp_file_list: List[str], data_type_list: List[str],
              jsonl_file_out: str, **kwargs):
    """wav.scp + text.txt -> jsonl with source/target (+lengths)."""
    from funasr_tpu.utils.load_utils import load_audio

    maps = [_read_scp(p) for p in scp_file_list]
    keys = [k for k in maps[0] if all(k in m for m in maps)]
    with open(jsonl_file_out, "w", encoding="utf-8") as f:
        for k in keys:
            obj = {"key": k}
            for dtype, m in zip(data_type_list, maps):
                obj[dtype] = m[k]
                if dtype == "source":
                    try:
                        obj["source_len"] = int(len(load_audio(m[k])))
                    except Exception:  # noqa: BLE001
                        obj["source_len"] = -1
                elif dtype == "target":
                    obj["target_len"] = len(m[k].replace(" ", ""))
            f.write(json.dumps(obj, ensure_ascii=False) + "\n")
    print(f"wrote {len(keys)} lines to {jsonl_file_out}")


def jsonl2scp(jsonl_file_in: str, scp_file_out: str, data_type: str = "source",
              **kwargs):
    with open(jsonl_file_in, encoding="utf-8") as fin, \
            open(scp_file_out, "w", encoding="utf-8") as fout:
        for line in fin:
            obj = json.loads(line)
            fout.write(f"{obj.get('key')}\t{obj.get(data_type)}\n")
    print(f"wrote {scp_file_out}")


def compute_cmvn(jsonl: str, out: str, dim: int = 560, lfr_m: int = 7,
                 lfr_n: int = 6, n_mels: int = 80, max_utts: int = 5000, **kwargs):
    """Accumulate fbank+LFR stats over the corpus -> Kaldi-format am.mvn."""
    import jax
    from funasr_tpu.ops.fbank import fbank
    from funasr_tpu.ops.lfr import apply_lfr
    from funasr_tpu.utils.load_utils import load_audio
    import jax.numpy as jnp

    total = np.zeros((dim,), np.float64)
    total_sq = np.zeros((dim,), np.float64)
    n = 0
    with open(jsonl, encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i >= max_utts:
                break
            obj = json.loads(line)
            wav = load_audio(obj["source"])
            feats = np.asarray(apply_lfr(
                fbank(jnp.asarray(wav * 32768.0), num_mel_bins=n_mels),
                lfr_m, lfr_n))
            total += feats.sum(0)
            total_sq += (feats ** 2).sum(0)
            n += feats.shape[0]
    mean = total / max(n, 1)
    var = total_sq / max(n, 1) - mean ** 2
    add_shift = -mean
    rescale = 1.0 / np.sqrt(np.maximum(var, 1e-8))
    with open(out, "w", encoding="utf-8") as f:
        means = " ".join(f"{v:.8f}" for v in add_shift)
        istd = " ".join(f"{v:.8f}" for v in rescale)
        f.write(f"<Nnet>\n<Splice> {dim} {dim}\n[ 0 ]\n"
                f"<AddShift> {dim} {dim}\n<LearnRateCoef> 0 [ {means} ]\n"
                f"<Rescale> {dim} {dim}\n<LearnRateCoef> 0 [ {istd} ]\n</Nnet>\n")
    print(f"cmvn over {n} frames -> {out}")


def main_cli():
    from funasr_tpu.bin.train import parse_overrides
    assert len(sys.argv) > 1, __doc__
    cmd = sys.argv[1]
    cfg = parse_overrides(sys.argv[2:])
    fn = {"scp2jsonl": scp2jsonl, "jsonl2scp": jsonl2scp,
          "compute_cmvn": compute_cmvn}.get(cmd)
    assert fn is not None, f"unknown command {cmd}; {__doc__}"
    fn(**cfg)


if __name__ == "__main__":
    main_cli()
