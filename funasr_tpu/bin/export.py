"""Model export CLI -> serialized StableHLO artifacts.

TPU-era counterpart of the reference ONNX export (FunASR ``funasr/bin/export.py`` +
per-model ``export_meta.py`` + ``utils/export_utils.py``): instead of ONNX graphs the
artifact is a ``jax.export`` StableHLO function per shape bucket, alongside the same
sidecar files the C++ runtime loads (config.yaml, tokens, am.mvn). The C++ runtime
executes these through PJRT.

Usage:
    python -m funasr_tpu.bin.export ++model=<dir-or-alias> ++output_dir=exported \
        ++buckets='[(4,168),(8,336)]'
"""

from __future__ import annotations

import logging
import os
import shutil
import sys


def export_model(model, params, output_dir: str, buckets=None, vocab_size=None):
    """Serialize ``model.infer_jit`` for each (batch, frames) bucket."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    os.makedirs(output_dir, exist_ok=True)
    buckets = buckets or [(4, 168)]
    input_dim = model.encoder.cfg.input_size
    manifest = []
    for b, t in buckets:
        fn = jax.jit(lambda p, s, l: model.infer_jit(p, s, l)[:3])
        args = (params,
                jnp.zeros((b, t, input_dim), jnp.float32),
                jnp.zeros((b,), jnp.int32))
        exported = jexport.export(fn)(*args)
        blob = exported.serialize()
        name = f"model_b{b}_t{t}.stablehlo"
        with open(os.path.join(output_dir, name), "wb") as f:
            f.write(blob)
        manifest.append({"file": name, "batch": b, "frames": t,
                         "input_dim": input_dim})
        logging.info("exported %s (%d bytes)", name, len(blob))
    import json
    with open(os.path.join(output_dir, "export_manifest.json"), "w") as f:
        json.dump({"format": "stablehlo", "functions": manifest}, f, indent=2)
    return manifest


def main_cli():
    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.bin.train import parse_overrides

    logging.basicConfig(level=logging.INFO)
    cfg = parse_overrides(sys.argv[1:])
    assert "model" in cfg, "pass ++model=<dir-or-alias>"
    output_dir = cfg.pop("output_dir", "exported")
    buckets = cfg.pop("buckets", [(4, 168)])
    if isinstance(buckets, str):
        import ast
        buckets = ast.literal_eval(buckets)
    buckets = [tuple(b) for b in buckets]

    model, params, kwargs = AutoModel.build_model(**cfg)
    export_model(model, params, output_dir, buckets)
    # params ship separately from the StableHLO graphs (loaded back by
    # funasr_tpu.export_runtime.ExportedModel and the C++ PJRT path)
    from funasr_tpu.export_runtime import save_params_npz
    save_params_npz(params, os.path.join(output_dir, "params.npz"))
    # sidecars the C++ runtime loads (mirrors the reference artifact set)
    model_path = kwargs.get("model_path")
    if model_path:
        for name in ("config.yaml", "tokens.txt", "am.mvn", "tokens.json"):
            src = os.path.join(model_path, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(output_dir, name))
    logging.info("export complete -> %s", output_dir)


if __name__ == "__main__":
    main_cli()
