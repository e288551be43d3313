"""Small host-side helpers (config merging, file parsing)."""

from __future__ import annotations

from typing import Any, Dict


def deep_update(original: Dict[str, Any], update: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``update`` into ``original`` in place (reference
    ``funasr/utils/misc.py:90`` semantics: nested dicts merge, other values replace)."""
    for key, value in update.items():
        if isinstance(value, dict) and isinstance(original.get(key), dict):
            deep_update(original[key], value)
        else:
            original[key] = value
    return original


def int2vec(x: int, vec_dim: int = 8, dtype=None):
    import numpy as np
    b = ("{:0" + str(vec_dim) + "b}").format(x)
    return np.array([int(ch) for ch in b], dtype=dtype or np.float32)
