"""Every reference template.yaml must construct our model class (config-key
compatibility across the whole model zoo)."""

import glob
import os

import pytest
import yaml


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference not mounted")
def test_all_reference_templates_construct():
    import funasr_tpu  # noqa: F401
    from funasr_tpu.register import tables
    fails = []
    n = 0
    for path in sorted(glob.glob(
            "/root/reference/funasr/models/*/template.yaml")):
        name = path.split("/")[-2]
        try:
            cfg = yaml.safe_load(open(path))
        except yaml.YAMLError:
            continue
        if not isinstance(cfg, dict) or "model" not in cfg:
            continue
        kwargs = {k: v for k, v in cfg.items()
                  if k not in ("train_conf", "optim", "optim_conf", "scheduler",
                               "scheduler_conf", "dataset", "dataset_conf",
                               "tokenizer", "tokenizer_conf", "frontend",
                               "frontend_conf", "scope_map", "init_param")}
        kwargs.setdefault("vocab_size", 512)
        kwargs.setdefault("input_size", 560)
        mc = dict(kwargs.pop("model_conf", {}) or {})
        mc.update(kwargs)
        model_name = mc.pop("model")
        n += 1
        try:
            tables.model_classes[model_name](**mc)
        except Exception as e:  # noqa: BLE001 - collect all failures
            fails.append(f"{name} ({model_name}): {type(e).__name__}: {e}")
    assert n >= 20, f"only {n} templates found"
    assert not fails, "\n".join(fails)
