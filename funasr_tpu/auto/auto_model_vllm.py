"""AutoModelVLLM: the batched LLM-ASR serving facade.

Counterpart of FunASR ``funasr/auto/auto_model_vllm.py:181`` — same ``generate()``
surface, but instead of driving vLLM it drives the TPU-native continuous-batching
``LLMEngine`` (tensor parallelism comes from sharding the Qwen params over the mesh's
"model" axis via ``funasr_tpu.parallel``, replacing ``tensor_parallel_size``).
"""

from __future__ import annotations

import logging
from typing import List, Optional

_LLM_BASED_MODELS = {"FunASRNano", "LLMASR", "GLMASR", "Qwen3ASR"}


def check_vllm_applicable(model_class: str) -> bool:
    return model_class in _LLM_BASED_MODELS


class AutoModelVLLM:
    def __init__(self, **kwargs):
        from funasr_tpu.auto.auto_model import AutoModel

        self.tensor_parallel_size = kwargs.pop("tensor_parallel_size", 1)
        self.num_slots = kwargs.pop("max_num_seqs", 8)
        self.max_model_len = kwargs.pop("max_model_len", 2048)
        model, params, kwargs = AutoModel.build_model(**kwargs)
        name = type(model).__name__
        if not check_vllm_applicable(name):
            raise ValueError(
                f"{name} is not an LLM-based model; use AutoModel instead "
                f"(vLLM-path models: {sorted(_LLM_BASED_MODELS)})")
        if self.tensor_parallel_size > 1:
            import jax
            from funasr_tpu.parallel.sharding import make_mesh, param_shardings
            mesh = make_mesh(model=self.tensor_parallel_size)
            params = jax.device_put(params, param_shardings(params, mesh))
            logging.info("LLM params tensor-sharded over %d devices",
                         self.tensor_parallel_size)
        self.model = model
        self.params = params
        self.kwargs = kwargs

    def generate(self, input, input_len=None, **cfg):
        from funasr_tpu.auto.auto_model import prepare_data_iterator

        key_list, data_list = prepare_data_iterator(input, input_len=input_len)
        merged = dict(self.kwargs)
        merged.update(cfg)
        merged.setdefault("num_slots", self.num_slots)
        merged.setdefault("max_model_len", self.max_model_len)
        results, _ = self.model.inference(
            self.params, data_list, key=key_list,
            tokenizer=merged.get("tokenizer"), frontend=merged.get("frontend"),
            **{k: v for k, v in merged.items()
               if k not in ("tokenizer", "frontend", "model", "model_conf")})
        return results
