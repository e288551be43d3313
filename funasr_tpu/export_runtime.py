"""Pure artifact-loader inference: run exported models without model code.

Counterpart of the reference's ``funasr_onnx`` pip package
(FunASR ``runtime/python/onnxruntime/funasr_onnx/paraformer_bin.py`` etc. —
inference from exported graphs + sidecar files, no training codebase): this
loader deserializes the ``jax.export`` StableHLO functions written by
``funasr-tpu-export`` plus the sidecars (config.yaml for the frontend,
tokens.txt, am.mvn) and transcribes audio. Nothing from ``funasr_tpu.models``
is imported — the neural compute is the serialized artifact itself, so this is
the deployment path where model code updates cannot change serving behavior.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np


class ExportedModel:
    """``ExportedModel(dir).transcribe(wavs) -> [text, ...]``."""

    def __init__(self, export_dir: str):
        from jax import export as jexport
        import yaml

        with open(os.path.join(export_dir, "export_manifest.json")) as f:
            manifest = json.load(f)
        assert manifest.get("format") == "stablehlo", manifest.get("format")
        self.functions = []
        for entry in manifest["functions"]:
            with open(os.path.join(export_dir, entry["file"]), "rb") as f:
                exported = jexport.deserialize(bytearray(f.read()))
            self.functions.append({**entry, "call": exported.call})
        self.functions.sort(key=lambda e: (e["batch"], e["frames"]))

        cfg_path = os.path.join(export_dir, "config.yaml")
        self.config = yaml.safe_load(open(cfg_path)) if os.path.exists(cfg_path) \
            else {}
        self.tokens: Optional[List[str]] = None
        tok_path = os.path.join(export_dir, "tokens.txt")
        if os.path.exists(tok_path):
            self.tokens = open(tok_path, encoding="utf-8").read().splitlines()

        # the exported function captured the params as constants? No — export
        # serialized fn(params, speech, lens); params ship separately.
        params_path = os.path.join(export_dir, "params.npz")
        self.params = None
        if os.path.exists(params_path):
            self.params = _unflatten_npz(np.load(params_path))

        from funasr_tpu.frontends.wav_frontend import WavFrontend
        fconf = dict(self.config.get("frontend_conf") or {})
        cmvn = os.path.join(export_dir, "am.mvn")
        if os.path.exists(cmvn):
            fconf["cmvn_file"] = cmvn
        self.frontend = WavFrontend(**fconf)

    def _pick(self, b: int, t: int):
        for e in self.functions:
            if e["batch"] >= b and e["frames"] >= t:
                return e
        return self.functions[-1]

    def transcribe(self, wavs, fs: int = 16000) -> List[str]:
        """wavs: list of 1-D float waveforms or file paths -> texts."""
        import jax.numpy as jnp
        from funasr_tpu.utils.load_utils import load_audio_text_image_video

        audio = load_audio_text_image_video(list(wavs), fs=self.frontend.fs,
                                            audio_fs=fs)
        feats, lens = self.frontend.extract(audio)
        b, t, _ = feats.shape
        e = self._pick(b, t)
        if t > e["frames"]:
            feats = feats[:, : e["frames"]]
            lens = np.minimum(lens, e["frames"])
        padded = np.zeros((e["batch"], e["frames"], feats.shape[-1]), np.float32)
        padded[:b, :t] = feats
        plens = np.zeros((e["batch"],), np.int32)
        plens[:b] = lens
        if self.params is None:
            raise RuntimeError(
                "params.npz missing from the export dir — re-export with a "
                "funasr-tpu-export version that writes params")
        yseq, token_lens, _ = e["call"](self.params, jnp.asarray(padded),
                                        jnp.asarray(plens))
        yseq = np.asarray(yseq)
        token_lens = np.asarray(token_lens)
        out = []
        for i in range(b):
            ids = [int(x) for x in yseq[i, : token_lens[i]] if x > 2]
            if self.tokens:
                out.append("".join(self.tokens[j] for j in ids
                                   if j < len(self.tokens)))
            else:
                out.append(" ".join(map(str, ids)))
        return out


def _flatten_params(params, prefix=""):
    flat = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(_flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(_flatten_params(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def _unflatten_npz(npz):
    root: dict = {}
    for key in npz.files:
        node = root
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = npz[key]
    return _listify(root)


def _listify(node):
    """Dicts whose keys are 0..n-1 ints become lists (round-trip of list params)."""
    if not isinstance(node, dict):
        return node
    out = {k: _listify(v) for k, v in node.items()}
    if out and all(k.isdigit() for k in out):
        idx = sorted(out, key=int)
        if [int(i) for i in idx] == list(range(len(idx))):
            return [out[i] for i in idx]
    return out


def save_params_npz(params, path: str):
    """Write a params pytree as a flat npz (used by funasr-tpu-export)."""
    np.savez(path, **_flatten_params(params))
