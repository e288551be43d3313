"""N-best checkpoint averaging (counterpart of FunASR
``funasr/train_utils/average_nbest_models.py:61``)."""

from __future__ import annotations

import logging
import os
import pickle
from typing import List, Optional

import jax
import numpy as np


def average_checkpoints(output_dir: str, avg_nbest_model: int = 5,
                        ckpt_paths: Optional[List[str]] = None,
                        out_name: str = "model.pt.avg") -> str:
    """Average the params of the n best checkpoints (by recorded metric) in
    ``output_dir`` and write ``model.pt.avg``. Returns the output path."""
    if ckpt_paths is None:
        cands = []
        for name in os.listdir(output_dir):
            if not name.startswith("model.pt.ep"):
                continue
            path = os.path.join(output_dir, name)
            with open(path, "rb") as f:
                state = pickle.load(f)
            metric = state.get("metric")
            if metric is not None:
                cands.append((metric, path))
        cands.sort(key=lambda x: x[0])
        ckpt_paths = [p for _, p in cands[:avg_nbest_model]]
    if not ckpt_paths:
        raise FileNotFoundError(f"no rankable checkpoints in {output_dir}")

    avg = None
    for path in ckpt_paths:
        with open(path, "rb") as f:
            params = pickle.load(f)["params"]
        if avg is None:
            avg = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)
        else:
            avg = jax.tree_util.tree_map(lambda a, x: a + np.asarray(x, np.float64),
                                         avg, params)
    n = len(ckpt_paths)
    avg = jax.tree_util.tree_map(lambda a: (a / n).astype(np.float32), avg)
    out = os.path.join(output_dir, out_name)
    with open(out, "wb") as f:
        pickle.dump({"params": avg, "averaged_from": ckpt_paths}, f)
    logging.info("averaged %d checkpoints -> %s", n, out)
    return out
