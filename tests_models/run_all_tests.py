#!/usr/bin/env python3
"""Run every real-checkpoint model test in sequence and report.

Counterpart of reference tests_models/run_all_tests.py:13-24. Exit code 77
from a test means skipped (no cache / no network)."""
import os
import subprocess
import sys
import time

TEST_DIR = os.path.dirname(os.path.abspath(__file__))

TESTS = [
    "test_fsmn_vad.py",
    "test_fsmn_vad_streaming.py",
    "test_ct_transformer.py",
    "test_paraformer.py",
    "test_sensevoice.py",
    "test_sensevoice_spk.py",
    "test_campplus.py",
    "test_paraformer_streaming.py",
    "test_seaco_paraformer.py",
    "test_qwen3_asr.py",
    "test_glm_asr.py",
    "test_fun_asr_nano_spk.py",
    "test_eres2netv2.py",
]


def main():
    results = {}
    for name in TESTS:
        t0 = time.time()
        r = subprocess.run([sys.executable, os.path.join(TEST_DIR, name)],
                           cwd=TEST_DIR)
        status = {0: "PASS", 77: "SKIP"}.get(r.returncode, "FAIL")
        results[name] = (status, time.time() - t0)
        print(f"{'=' * 60}\n{name}: {status} ({results[name][1]:.1f}s)\n")
    print("=" * 60)
    for name, (status, dt) in results.items():
        print(f"{status:5s} {name} ({dt:.1f}s)")
    return 1 if any(s == "FAIL" for s, _ in results.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
