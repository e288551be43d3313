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


def stub_sond_legacy_deps():
    """The reference's SOND/xvector files target an older internal API surface
    (``funasr.models.{decoder,encoder,pooling}``, ``base_model``, ``hinter`` …)
    that the snapshot no longer ships. Inject minimal stand-ins so the torch
    modules import for parity testing."""
    import importlib.machinery
    import sys
    import types

    import torch

    stub_reference_deps()

    def _mod(name):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = m
        if "." in name:
            parent, leaf = name.rsplit(".", 1)
            setattr(_mod(parent), leaf, m)
        return m

    oc = _mod("omegaconf")
    # another test file may have installed a partial omegaconf shim first;
    # fill in whichever names funasr.utils.misc imports are still missing
    if not hasattr(oc, "OmegaConf"):
        oc.OmegaConf = types.SimpleNamespace(create=lambda *a, **k: dict(*a),
                                             to_container=lambda c, **k: dict(c))
    if not hasattr(oc, "DictConfig"):
        oc.DictConfig = dict

    import funasr.models  # noqa: F401  (real package, ensure loaded first)

    def _abs(name):
        # distinct subclasses: the reference's isinstance(x, AbsEncoder)
        # dispatch must not match unrelated modules
        return type(name, (torch.nn.Module,), {})

    _mod("funasr.models.decoder.abs_decoder").AbsDecoder = _abs("AbsDecoder")
    _mod("funasr.models.encoder.abs_encoder").AbsEncoder = _abs("AbsEncoder")
    _mod("funasr.layers.abs_normalize").AbsNormalize = _abs("AbsNormalize")
    _mod("funasr.models.base_model").FunASRModel = _abs("FunASRModel")
    spec_aug = _mod("funasr.models.specaug.abs_specaug")
    spec_aug.AbsSpecAug = _abs("AbsSpecAug")
    _mod("funasr.models.specaug.abs_profileaug").AbsProfileAug = \
        _abs("AbsProfileAug")
    _mod("funasr.utils.hinter").hint_once = lambda *a, **k: None
    import funasr.models.ctc as _ctc_pkg
    if not hasattr(_ctc_pkg, "CTC"):
        from funasr.models.ctc.ctc import CTC as _CTC
        _ctc_pkg.CTC = _CTC
    from funasr.models.sond.pooling import statistic_pooling as _sp
    pooling = _mod("funasr.models.pooling.statistic_pooling")
    pooling.statistic_pooling = _sp.statistic_pooling
    pooling.windowed_statistic_pooling = _sp.windowed_statistic_pooling
    pooling.StatisticPooling = _sp.StatisticPooling


@pytest.fixture
def rng():
    return np.random.default_rng(0)
