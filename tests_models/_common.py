"""Shared helpers for the real-checkpoint model tests.

Mirror of the reference's ``tests_models/`` tier (FunASR
``tests_models/test_paraformer.py:11-35``): each script is a standalone
``main()`` that builds the real AutoModel pipeline from hub checkpoints and
asserts a non-empty result. They need either network access (hub download) or
a pre-populated snapshot cache mounted via ``FUNASR_TPU_CACHE``; when neither
is available they exit with code 77 (the automake "skipped" convention, also
honored by run_all_tests.py).
"""

import os
import sys
import wave

SKIP = 77


def require_cache_or_network(alias_hint: str) -> None:
    """Exit 77 unless a model cache is mounted or downloads are allowed."""
    cache = os.environ.get("FUNASR_TPU_CACHE", "")
    if cache and os.path.isdir(cache):
        return
    if os.environ.get("FUNASR_TPU_ALLOW_DOWNLOAD") == "1":
        return
    print(f"[skip] no FUNASR_TPU_CACHE and downloads not enabled "
          f"(need {alias_hint}); set FUNASR_TPU_CACHE=<snapshot dir> or "
          f"FUNASR_TPU_ALLOW_DOWNLOAD=1")
    sys.exit(SKIP)


def example_wav() -> str:
    """A real speech example if the cache ships one, else a synthetic tone."""
    cache = os.environ.get("FUNASR_TPU_CACHE", "")
    if cache:
        for root, _, files in os.walk(cache):
            for f in files:
                if f == "asr_example.wav" or (f.endswith(".wav")
                                              and "example" in root):
                    return os.path.join(root, f)
    import numpy as np
    path = "/tmp/funasr_tpu_models_example.wav"
    if not os.path.exists(path):
        rng = np.random.default_rng(0)
        sig = (rng.standard_normal(5 * 16000) * 0.1 * 32767).astype(np.int16)
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(sig.tobytes())
    return path


def finish(name: str, ok: bool, detail="") -> int:
    print(f"[{name}] {'PASSED' if ok else 'FAILED'} {detail}")
    return 0 if ok else 1
