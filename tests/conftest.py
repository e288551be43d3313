"""Test configuration: force an 8-device virtual CPU mesh before JAX backends init.

The environment pins ``JAX_PLATFORMS=axon`` (the real TPU tunnel); tests must run on
host CPU, so we override through the jax config API (the env var is ignored once the
axon plugin registers). Multi-chip sharding paths are validated on the 8 virtual CPU
devices; the driver separately dry-runs the real multichip path via
``__graft_entry__.dryrun_multichip``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def stub_reference_deps():
    """Inject stub modules for reference-only deps (kaldiio/librosa/torchaudio) with
    proper ModuleSpecs so importlib.find_spec-based feature probes don't crash."""
    import importlib.machinery
    import sys
    import types

    for name in ("kaldiio", "librosa", "torchaudio", "torchaudio.compliance",
                 "torchaudio.compliance.kaldi"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = mod


@pytest.fixture
def rng():
    return np.random.default_rng(0)
