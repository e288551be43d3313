"""Misc training utilities (counterparts of FunASR ``funasr/train_utils/``:
``set_all_random_seed.py``, ``model_summary.py``, ``load_pretrained_model.py`` with
scope_map/excludes remapping, ``add_gradient_noise.py``)."""

from __future__ import annotations

import logging
import random
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np


def set_all_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def model_summary(params) -> str:
    """Per-top-level-branch param counts + total (reference model_summary role)."""
    lines = []
    total = 0
    for name, sub in (params.items() if isinstance(params, dict) else [("", params)]):
        n = sum(int(x.size) for x in jax.tree_util.tree_leaves(sub))
        total += n
        lines.append(f"  {name:24s} {n / 1e6:10.2f} M")
    lines.append(f"  {'TOTAL':24s} {total / 1e6:10.2f} M")
    out = "\n".join(lines)
    logging.info("model summary:\n%s", out)
    return out


def load_pretrained_model(params, path: str, model=None,
                          scope_map: Optional[Sequence[str]] = None,
                          excludes: Optional[Sequence[str]] = None,
                          ignore_init_mismatch: bool = True):
    """Load a torch ``model.pt`` (or pickled params) into an existing param tree.

    ``scope_map``: ["src_prefix", "dst_prefix", ...] key remappings applied to the
    torch state dict before conversion (reference ``load_pretrained_model.py``
    semantics); ``excludes``: key prefixes to drop.
    """
    import pickle

    if path.endswith((".pkl", ".avg")) or "model.pt.ep" in path:
        with open(path, "rb") as f:
            state = pickle.load(f)
        loaded = state["params"] if "params" in state else state
        return jax.tree_util.tree_map(lambda old, new: np.asarray(new), params,
                                      loaded)

    from funasr_tpu.convert.torch_to_jax import (convert_state_dict,
                                                 load_torch_checkpoint)
    sd = load_torch_checkpoint(path)
    if scope_map:
        pairs = list(scope_map)
        remapped = {}
        for k, v in sd.items():
            for i in range(0, len(pairs) - 1, 2):
                if k.startswith(pairs[i]):
                    k = pairs[i + 1] + k[len(pairs[i]):]
                    break
            remapped[k] = v
        sd = remapped
    if excludes:
        sd = {k: v for k, v in sd.items()
              if not any(k.startswith(e) for e in excludes)}
    try:
        return convert_state_dict(sd, model)
    except (NotImplementedError, KeyError) as exc:
        if ignore_init_mismatch:
            logging.warning("pretrained load mismatch (%s); keeping random init",
                            exc)
            return params
        raise


def add_gradient_noise(grads, rng, step: int, eta: float = 1.0,
                       gamma: float = 0.55):
    """Annealed gaussian gradient noise (reference ``add_gradient_noise.py``)."""
    import jax.numpy as jnp
    sigma = eta / (1 + step) ** gamma
    leaves, treedef = jax.tree_util.tree_flatten(grads)
    keys = jax.random.split(rng, len(leaves))
    noisy = [g + sigma * jax.random.normal(k, g.shape, g.dtype)
             for g, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, noisy)
