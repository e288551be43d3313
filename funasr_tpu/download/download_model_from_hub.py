"""Model resolution: alias -> hub id -> local snapshot dir -> merged config kwargs.

Counterpart of FunASR ``funasr/download/download_model_from_hub.py:9-160``. In
network-less environments the hub download is skipped: aliases resolve through a local
cache (``FUNASR_TPU_CACHE`` or ``~/.cache/funasr_tpu`` / modelscope cache layouts);
a local directory containing ``config.yaml`` is always accepted directly.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict

import yaml

from funasr_tpu.download.name_maps_from_hub import name_maps_hf, name_maps_ms
from funasr_tpu.utils.misc import deep_update

_FILE_KEYS = (
    "cmvn_file", "seg_dict_file", "seg_dict", "bpemodel", "token_list",
    "jieba_usr_dict", "init_param", "tokenizer_conf.token_list",
)


def _candidate_cache_dirs(model_id: str):
    for env in ("FUNASR_TPU_CACHE", "MODELSCOPE_CACHE"):
        base = os.environ.get(env)
        if base:
            yield os.path.join(base, model_id)
            yield os.path.join(base, "hub", model_id)
    home = os.path.expanduser("~")
    yield os.path.join(home, ".cache", "funasr_tpu", model_id)
    yield os.path.join(home, ".cache", "modelscope", "hub", model_id)


def resolve_model_dir(model: str, hub: str = "ms") -> str:
    if os.path.isdir(model) and os.path.exists(os.path.join(model, "config.yaml")):
        return model
    name_map = name_maps_hf if hub == "hf" else name_maps_ms
    model_id = name_map.get(model, name_map.get(model.lower(), model))
    for cand in _candidate_cache_dirs(model_id):
        if os.path.isdir(cand) and os.path.exists(os.path.join(cand, "config.yaml")):
            return cand
    raise FileNotFoundError(
        f"model '{model}' (id '{model_id}') not found locally and network download is "
        f"unavailable; place the snapshot (config.yaml + model.pt + assets) under "
        f"$FUNASR_TPU_CACHE/{model_id} or pass a local directory path")


def _rewrite_paths(cfg: Dict[str, Any], model_dir: str):
    """Make file-valued config entries absolute against the model dir."""
    def fix(d: Dict[str, Any]):
        for k, v in list(d.items()):
            if isinstance(v, dict):
                fix(v)
            elif isinstance(v, str) and not os.path.isabs(v):
                if k in ("cmvn_file", "seg_dict_file", "seg_dict", "bpemodel",
                         "token_list", "jieba_usr_dict", "stats_file"):
                    cand = os.path.join(model_dir, v)
                    if os.path.exists(cand):
                        d[k] = cand
    fix(cfg)


def download_model(**kwargs) -> Dict[str, Any]:
    """Resolve ``kwargs['model']`` and merge its config.yaml under the user kwargs."""
    model = kwargs.get("model")
    assert model is not None, "model is required"
    model_dir = resolve_model_dir(model, hub=kwargs.get("hub", "ms"))
    with open(os.path.join(model_dir, "config.yaml"), "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f) or {}
    _rewrite_paths(cfg, model_dir)
    merged: Dict[str, Any] = {}
    deep_update(merged, cfg)
    deep_update(merged, kwargs)  # user overrides win
    merged["model_path"] = model_dir
    if "model" in cfg:
        merged["model"] = cfg["model"]  # config names the model CLASS
    if "init_param" not in merged:
        for name in ("model.pt", "model.pb", "model.safetensors"):
            cand = os.path.join(model_dir, name)
            if os.path.exists(cand):
                merged["init_param"] = cand
                break
    logging.info("resolved model %s -> %s", model, model_dir)
    return merged
