"""Packaging metadata guards (reference tests/test_pypi_metadata.py role):
every console script resolves to an importable callable, the metadata files
referenced from pyproject exist, and the declared core deps import."""

import importlib
import os
import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _project():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)["project"]


def test_metadata_basics():
    proj = _project()
    assert proj["name"] == "funasr-tpu"
    assert proj["version"].count(".") == 2
    assert proj["requires-python"].startswith(">=")
    assert os.path.exists(os.path.join(REPO, proj["readme"]))


def test_console_scripts_resolve():
    proj = _project()
    scripts = proj["scripts"]
    # the reference funasr CLI surface: inference/train/export + servers
    for needed in ("funasr-tpu", "funasr-tpu-train", "funasr-tpu-export",
                   "funasr-tpu-server", "funasr-tpu-benchmark",
                   "funasr-tpu-data"):
        assert needed in scripts, needed
    for name, target in scripts.items():
        mod_name, func = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func)), (name, target)


def test_core_dependencies_importable():
    proj = _project()
    for dep in proj["dependencies"]:
        root = dep.split("[")[0].split(">")[0].split("=")[0].strip()
        importlib.import_module({"pyyaml": "yaml"}.get(root, root))
