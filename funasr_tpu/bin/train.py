"""Training CLI (counterpart of FunASR ``funasr/bin/train.py``; hydra-style
``++key=value`` overrides without the hydra dependency).

Usage:
    python -m funasr_tpu.bin.train ++model=<dir-or-alias> \
        ++train_data_set_list=train.jsonl ++valid_data_set_list=val.jsonl \
        ++dataset_conf.batch_size=16 ++train_conf.max_epoch=10 ++output_dir=exp1
"""

from __future__ import annotations

import ast
import logging
import sys
from typing import Any, Dict

import jax

from funasr_tpu.utils.misc import deep_update


def parse_overrides(argv) -> Dict[str, Any]:
    cfg: Dict[str, Any] = {}
    for arg in argv:
        if arg.startswith("++"):
            key, _, value = arg[2:].partition("=")
        elif arg.startswith("--"):
            key, _, value = arg[2:].partition("=")
        else:
            continue
        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return cfg


def main(**kwargs):
    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.datasets.dataloader_entry import DataloaderMapStyle
    from funasr_tpu.optimizers import build_optimizer
    from funasr_tpu.parallel.sharding import make_mesh
    from funasr_tpu.schedulers import build_scheduler
    from funasr_tpu.train_utils.average_nbest_models import average_checkpoints
    from funasr_tpu.train_utils.trainer import Trainer

    # multi-host: ++distributed=true runs jax.distributed.initialize() (the
    # TPU-native stand-in for the reference's torchrun env:// NCCL rendezvous —
    # coordinator/process env vars are read from the TPU runtime).
    if kwargs.pop("distributed", False):
        try:
            jax.distributed.initialize()
        except ValueError as e:
            raise SystemExit(
                f"++distributed=true needs a multi-host JAX environment "
                f"(coordinator/process env vars, set automatically on TPU "
                f"pods): {e}") from e

    model, params, kwargs = AutoModel.build_model(**kwargs)

    # data
    dataloader_cls = kwargs.get("dataloader", "DataloaderMapStyle")
    from funasr_tpu.register import tables
    dl_kwargs = {k: v for k, v in kwargs.items() if k not in ("frontend", "tokenizer")}
    dl = tables.dataloader_classes[dataloader_cls](
        frontend=kwargs.get("frontend"), tokenizer=kwargs.get("tokenizer"),
        **dl_kwargs)

    # optim + schedule
    optim_conf = dict(kwargs.get("optim_conf", {}))
    schedule = None
    if kwargs.get("scheduler"):
        schedule = build_scheduler(kwargs["scheduler"],
                                   kwargs.get("scheduler_conf", {}),
                                   base_lr=optim_conf.get("lr"))
    tx = build_optimizer(kwargs.get("optim", "adam"), optim_conf, schedule)

    train_conf = dict(kwargs.get("train_conf", {}))
    model_par = int(kwargs.get("model_parallel_size", 1))
    mesh = make_mesh(model=model_par)
    trainer = Trainer(model, tx, frontend=kwargs.get("frontend"),
                      output_dir=kwargs.get("output_dir", "exp"),
                      sharding=kwargs.get("sharding", "dp"),
                      pp_micro=int(kwargs.get("pp_micro", 2)),
                      mesh=mesh, **train_conf)
    params = trainer.run(params, dl.train, dl.valid,
                         rng=jax.random.PRNGKey(kwargs.get("seed", 0)))

    avg_n = train_conf.get("avg_nbest_model", 0)
    if avg_n:
        try:
            average_checkpoints(trainer.output_dir, avg_n)
        except FileNotFoundError as e:
            logging.warning("checkpoint averaging skipped: %s", e)
    return params


def main_cli():
    logging.basicConfig(level=logging.INFO)
    cfg = parse_overrides(sys.argv[1:])
    assert "model" in cfg, "pass ++model=<dir-or-alias>"
    main(**cfg)


if __name__ == "__main__":
    main_cli()
