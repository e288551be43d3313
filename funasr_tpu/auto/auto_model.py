"""AutoModel — the user-facing pipeline API.

TPU-native rebuild of the reference orchestration layer (FunASR ``funasr/auto/
auto_model.py``: ``__init__:420`` builds main + optional VAD/PUNC/SPK sub-models from
hub configs; ``generate:683`` routes to ``inference:744`` or ``inference_with_vad:846``
— VAD segmentation -> length-sorted ``batch_size_s`` dynamic batching -> per-segment
ASR -> timestamp offset merge -> punctuation -> speaker clustering).

Functional-model adaptation: every built model is an (object, params-pytree) pair; all
host orchestration logic is unchanged in behavior, but batches are padded to bucketed
shapes before hitting the jitted device path.
"""

from __future__ import annotations

import copy
import logging
import os
import random
import string
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from funasr_tpu.download.download_model_from_hub import download_model
from funasr_tpu.register import tables
from funasr_tpu.utils.misc import deep_update
from funasr_tpu.utils.vad_utils import merge_vad, slice_padding_audio_samples


def _join_vad_texts(texts) -> str:
    """Strip rich tags and join per-VAD-segment texts, inserting a space only
    when the join boundary is not CJK-to-CJK (reference
    ``funasr/auto/auto_model.py:56-68``). This surface feeds the punctuation
    model AND sentence segmentation — CJK segment boundaries therefore form
    clumped tokens ("丳丱") whose sentence gets one merged timestamp, exactly
    like the reference pipeline."""
    import re

    cleaned = [re.sub(r"<\|[^|]*\|>", "", str(t)).strip() for t in texts]
    cleaned = [t for t in cleaned if t]
    if not cleaned:
        return ""
    joined = cleaned[0]
    for text in cleaned[1:]:
        sep = "" if ("㐀" <= joined[-1] <= "鿿"
                     and "㐀" <= text[0] <= "鿿") else " "
        joined += sep + text
    return joined


def _rand_key() -> str:
    chars = string.ascii_letters + string.digits
    return "rand_key_" + "".join(random.choice(chars) for _ in range(13))


def prepare_data_iterator(data_in, input_len=None, data_type=None, key=None):
    """Normalize input (path/scp/jsonl/list/bytes/array/text) to (keys, data) lists
    (reference ``prepare_data_iterator:347`` behavior)."""
    import json

    data_list, key_list = [], []
    filelist = (".scp", ".txt", ".json", ".jsonl", ".text")

    if isinstance(data_in, str) and os.path.exists(data_in):
        ext = os.path.splitext(data_in)[1].lower()
        if ext in filelist:
            with open(data_in, encoding="utf-8") as fin:
                for line in fin:
                    k = _rand_key()
                    if data_in.endswith(".jsonl"):
                        obj = json.loads(line.strip())
                        data = obj["source"]
                        k = obj.get("key", k)
                    else:
                        parts = line.strip().split(maxsplit=1)
                        data = parts[1] if len(parts) > 1 else parts[0]
                        k = parts[0] if len(parts) > 1 else k
                    data_list.append(data)
                    key_list.append(k)
        else:
            if isinstance(key, (list, tuple)):
                key = key[0] if key else None
            k = key if key is not None else os.path.splitext(
                os.path.basename(data_in))[0]
            data_list, key_list = [data_in], [k]
    elif isinstance(data_in, (list, tuple)):
        data_list = list(data_in)
        keys = (list(key) if isinstance(key, (list, tuple)) else None)
        for i, d in enumerate(data_list):
            if keys is not None and i < len(keys):
                key_list.append(keys[i])
            elif isinstance(d, str) and os.path.exists(d):
                key_list.append(os.path.splitext(os.path.basename(d))[0])
            else:
                key_list.append(_rand_key())
    else:
        if isinstance(data_in, bytes):
            from funasr_tpu.utils.load_utils import load_bytes
            data_in = load_bytes(data_in)
        if isinstance(key, (list, tuple)):
            key = key[0] if key else None
        key_list = [key if key is not None else _rand_key()]
        data_list = [data_in]
    return key_list, data_list


class AutoModel:
    def __init__(self, **kwargs):
        log_level = getattr(logging, kwargs.get("log_level", "INFO").upper())
        logging.basicConfig(level=log_level)

        model, params, kwargs = self.build_model(**kwargs)

        vad_model = kwargs.get("vad_model")
        vad_kwargs = dict(kwargs.get("vad_kwargs") or {})
        vad_params = None
        if vad_model is not None:
            vad_kwargs.update(model=vad_model, device=kwargs.get("device", "tpu"))
            if "hub" in kwargs:
                vad_kwargs.setdefault("hub", kwargs["hub"])
            vad_model, vad_params, vad_kwargs = self.build_model(**vad_kwargs)

        punc_model = kwargs.get("punc_model")
        punc_kwargs = dict(kwargs.get("punc_kwargs") or {})
        punc_params = None
        if punc_model is not None:
            punc_kwargs.update(model=punc_model, device=kwargs.get("device", "tpu"))
            if "hub" in kwargs:
                punc_kwargs.setdefault("hub", kwargs["hub"])
            punc_model, punc_params, punc_kwargs = self.build_model(**punc_kwargs)

        spk_model = kwargs.get("spk_model")
        spk_kwargs = dict(kwargs.get("spk_kwargs") or {})
        spk_params = None
        if spk_model is not None:
            spk_kwargs.update(model=spk_model, device=kwargs.get("device", "tpu"))
            if "hub" in kwargs:
                spk_kwargs.setdefault("hub", kwargs["hub"])
            spk_model, spk_params, spk_kwargs = self.build_model(**spk_kwargs)
            from funasr_tpu.models.campplus.cluster_backend import ClusterBackend
            self.cb_model = ClusterBackend(**(spk_kwargs.get("cb_kwargs") or {}))
            self.spk_mode = kwargs.get("spk_mode", "punc_segment")

        self.kwargs = kwargs
        self.model, self.model_params = model, params
        self.vad_model, self.vad_params, self.vad_kwargs = vad_model, vad_params, vad_kwargs
        self.punc_model, self.punc_params, self.punc_kwargs = (punc_model, punc_params,
                                                               punc_kwargs)
        self.spk_model, self.spk_params, self.spk_kwargs = spk_model, spk_params, spk_kwargs
        self.model_path = kwargs.get("model_path")
        self._store_base_configs()

    # ------------------------------------------------------------------

    def _store_base_configs(self):
        self._base_kwargs = copy.deepcopy(
            {k: v for k, v in self.kwargs.items()
             if isinstance(v, (str, int, float, bool, list, dict, type(None)))})

    def _reset_runtime_configs(self):
        snapshot = copy.deepcopy(self._base_kwargs)
        for k in list(self.kwargs):
            if k not in snapshot and isinstance(
                    self.kwargs[k], (str, int, float, bool, list, dict, type(None))):
                del self.kwargs[k]  # runtime-added override from a previous call
        self.kwargs.update(snapshot)

    @staticmethod
    def build_model(**kwargs):
        assert "model" in kwargs
        # device="cpu" pins JAX to host (reference AutoModel(device=...) parity,
        # funasr/auto/auto_model.py: device selects cuda/cpu). Must run before the
        # first jax computation; jax raises if a backend is already initialized.
        if str(kwargs.get("device", "") or "").startswith("cpu"):
            try:
                jax.config.update("jax_platforms", "cpu")
            except RuntimeError:
                logging.warning("device=cpu requested but a JAX backend is already "
                                "initialized; keeping the existing platform")
        quantization = kwargs.get("quant") or kwargs.get("quantization")
        if "model_conf" not in kwargs:
            kwargs = download_model(**kwargs)

        # tokenizer
        tokenizer = kwargs.get("tokenizer")
        kwargs["vocab_size"] = -1
        if tokenizer is not None and isinstance(tokenizer, str):
            tok_cls = tables.tokenizer_classes[tokenizer]
            tokenizer = tok_cls(**(kwargs.get("tokenizer_conf") or {}))
            vocab = getattr(tokenizer, "token_list", None)
            if vocab:
                kwargs["vocab_size"] = len(vocab)
                kwargs["token_list"] = vocab
            elif hasattr(tokenizer, "get_vocab_size"):
                kwargs["vocab_size"] = tokenizer.get_vocab_size()
        kwargs["tokenizer"] = tokenizer

        # frontend
        frontend = kwargs.get("frontend")
        kwargs["input_size"] = None
        if frontend is not None and isinstance(frontend, str):
            fe_cls = tables.frontend_classes[frontend]
            frontend = fe_cls(**(kwargs.get("frontend_conf") or {}))
            if hasattr(frontend, "output_size"):
                kwargs["input_size"] = frontend.output_size()
        kwargs["frontend"] = frontend

        model_class_name = kwargs["model"]
        model_class = tables.model_classes.get(model_class_name)
        if model_class is None:
            import funasr_tpu
            raise RuntimeError(
                f"model '{model_class_name}' is not registered. Registered: "
                f"{sorted(tables.model_classes)}. Import errors: "
                f"{funasr_tpu.get_import_errors()}")
        model_conf: Dict[str, Any] = {}
        deep_update(model_conf, kwargs.get("model_conf", {}))
        deep_update(model_conf, kwargs)
        model = model_class(**model_conf)

        seed = kwargs.get("seed", 0)
        params = model.init_params(jax.random.PRNGKey(seed))

        init_param = kwargs.get("init_param")
        if init_param is not None and os.path.exists(init_param):
            from funasr_tpu.convert.torch_to_jax import (
                convert_state_dict, load_native_checkpoint,
                load_torch_checkpoint)
            logging.info("loading pretrained params from %s", init_param)
            native = load_native_checkpoint(init_param)
            if native is not None:
                # own Trainer checkpoint (model.pt.ep*/model.pt.avg): the
                # pytree structure matches model.init_params by construction
                params = jax.tree_util.tree_map(
                    lambda old, new: jnp.asarray(new, old.dtype),
                    params, native)
            else:
                sd = load_torch_checkpoint(init_param)
                try:
                    params = convert_state_dict(sd, model, model_class_name)
                except NotImplementedError:
                    logging.warning("no converter for %s; using random init",
                                    model_class_name)

        if kwargs.get("bf16", False) or kwargs.get("fp16", False):
            from funasr_tpu.core.module import cast_floats
            params = cast_floats(params, jnp.bfloat16)
        if quantization and quantization not in ("int8", "w8", "w8a8"):
            logging.warning("unknown quant=%r (supported: int8, w8a8); params "
                            "stay unquantized", quantization)
        if quantization in ("int8", "w8"):
            # weight-only int8 (ggml-runtime counterpart, ops/quant.py):
            # halves HBM bytes per step — biggest win on memory-bound LLM decode
            from funasr_tpu.ops.quant import quantize_params_int8
            params = quantize_params_int8(params)
            logging.info("quantized linear weights to int8 (weight-only)")
        elif quantization == "w8a8":
            # W8A8 dynamic-activation int8: batched offline serving runs the
            # big encoder/decoder matmuls on the MXU double-rate int8 path
            from funasr_tpu.ops.quant import quantize_params_int8
            params = quantize_params_int8(params, mode="w8a8")
            logging.info("quantized linears to W8A8 dynamic int8 serving mode")
        return model, params, kwargs

    # ------------------------------------------------------------------

    def __call__(self, *args, **cfg):
        kwargs = self.kwargs
        deep_update(kwargs, cfg)
        return self.model(*args, kwargs)

    def generate(self, input, input_len=None, progress_callback=None, **cfg):
        from funasr_tpu.utils.postprocess_hotwords import (
            apply_postprocess_hotwords_to_results)

        self._reset_runtime_configs()
        if self.vad_model is None:
            results = self.inference(input, input_len=input_len,
                                     progress_callback=progress_callback, **cfg)
            if self.punc_model is not None:
                deep_update(self.punc_kwargs, cfg)
                for result in results:
                    punc_res = self.inference(result["text"], model=self.punc_model,
                                              params=self.punc_params,
                                              kwargs=self.punc_kwargs, **cfg)
                    if cfg.get("return_raw_text",
                               self.kwargs.get("return_raw_text", False)):
                        result["raw_text"] = copy.copy(result["text"])
                    result["text"] = punc_res[0]["text"]
            return apply_postprocess_hotwords_to_results(results, cfg)
        results = self.inference_with_vad(input, input_len=input_len,
                                          progress_callback=progress_callback, **cfg)
        return apply_postprocess_hotwords_to_results(results, cfg)

    def inference(self, input, input_len=None, model=None, params=None, kwargs=None,
                  key=None, progress_callback=None, **cfg):
        if kwargs is None:
            self._reset_runtime_configs()
        kwargs = self.kwargs if kwargs is None else kwargs
        kwargs.pop("cache", None)
        deep_update(kwargs, cfg)
        model = self.model if model is None else model
        params = self.model_params if params is None else params

        batch_size = kwargs.get("batch_size", 1)
        key_list, data_list = prepare_data_iterator(
            input, input_len=input_len, data_type=kwargs.get("data_type"), key=key)

        results_all: List[dict] = []
        speed_stats: Dict[str, Any] = {}
        n = len(data_list)
        time_speech, time_escape = 1e-9, 0.0
        # double-buffered batch loop: when the model exposes the
        # dispatch/fetch pair, batch k+1's host->device upload overlaps
        # batch k's compute + result fetch, so multi-batch jobs cost
        # ~max(IO, compute) per batch instead of the sum (the production
        # host's PCIe-DMA pipelining; reference batch loop role:
        # funasr/auto/auto_model.py:796-838)
        dispatch = getattr(model, "inference_dispatch", None)
        pipelined = dispatch is not None and n > batch_size

        def _finish(res, t1, end):
            nonlocal time_speech, time_escape
            results, meta = (res if isinstance(res, tuple) else (res, {}))
            t2 = time.perf_counter()
            results_all.extend(results)
            bdt = meta.get("batch_data_time", -1)
            speed_stats.update(load_data=meta.get("load_data", 0.0),
                               extract_feat=meta.get("extract_feat", 0.0),
                               forward=f"{t2 - t1:0.3f}", batch_size=len(results),
                               rtf=f"{(t2 - t1) / bdt:0.3f}" if bdt and bdt > 0 else "-")
            if progress_callback:
                progress_callback(end, n)
            if bdt and bdt > 0:
                time_speech += bdt
            time_escape += t2 - t1

        pending = None  # (handle, t1, end) of the in-flight batch
        for beg in range(0, n, batch_size):
            end = min(n, beg + batch_size)
            batch = {"data_in": data_list[beg:end], "key": key_list[beg:end]}
            t1 = time.perf_counter()
            if pipelined:
                handle = dispatch(params, **batch, **_strip(kwargs))
                if pending is not None:
                    _finish(model.inference_fetch(pending[0]), pending[1],
                            pending[2])
                pending = (handle, t1, end)
            else:
                _finish(model.inference(params, **batch, **_strip(kwargs)),
                        t1, end)
        if pending is not None:
            _finish(model.inference_fetch(pending[0]), pending[1], pending[2])
        logging.debug("speed_stats: %s rtf_avg=%.3f", speed_stats,
                      time_escape / time_speech)
        # host-side ITN postprocess (itn=True + a language): superset of the
        # reference, where ITN runs only inside SenseVoice prompts or the C++
        # runtime's openfst FARs — here any model's text can be normalized.
        if kwargs.get("itn") and not kwargs.get("use_itn"):
            from funasr_tpu.text.inverse_normalize import InverseNormalizer
            lang = str(kwargs.get("language", "zh") or "zh").lower()[:2]
            try:
                inv = InverseNormalizer(lang=lang)
            except ValueError:
                inv = None
            if inv is not None:
                for r in results_all:
                    if isinstance(r.get("text"), str):
                        r["text"] = inv.inverse_normalize(r["text"])
        return results_all

    # ------------------------------------------------------------------

    def inference_with_vad(self, input, input_len=None, **cfg):
        self._reset_runtime_configs()
        kwargs = self.kwargs

        # step 1: VAD
        deep_update(self.vad_kwargs, cfg)
        res = self.inference(input, input_len=input_len, model=self.vad_model,
                             params=self.vad_params, kwargs=self.vad_kwargs, **cfg)
        if cfg.get("merge_vad", False):
            for r in res:
                r["value"] = merge_vad(r["value"],
                                       kwargs.get("merge_length_s", 15) * 1000)

        # step 2: per-segment ASR with batch_size_s dynamic batching
        deep_update(kwargs, cfg)
        batch_size = max(int(kwargs.get("batch_size_s", 300)) * 1000, 1)
        batch_threshold_ms = int(kwargs.get("batch_size_threshold_s", 60)) * 1000
        kwargs["batch_size"] = batch_size

        key_list, data_list = prepare_data_iterator(
            input, input_len=input_len, data_type=kwargs.get("data_type"))
        from funasr_tpu.utils.load_utils import load_audio

        results_ret = []
        for i, r in enumerate(res):
            key = r["key"]
            vadsegments = r["value"]
            fs = kwargs["frontend"].fs if hasattr(kwargs.get("frontend"), "fs") else 16000
            speech = load_audio(data_list[i], fs=fs, audio_fs=kwargs.get("fs", 16000))
            speech_length = len(speech)
            n = len(vadsegments)
            sorted_data = sorted([(seg, idx) for idx, seg in enumerate(vadsegments)],
                                 key=lambda x: x[0][1] - x[0][0])
            if not sorted_data:
                results_ret.append({"key": key, "text": "", "timestamp": []})
                continue
            batch_ms = max(batch_size, sorted_data[0][0][1] - sorted_data[0][0][0])

            results_sorted: List[dict] = []
            all_segments: List = []
            beg_idx, end_idx, max_len = 0, 1, 0
            for j in range(n):
                sample_len = sorted_data[j][0][1] - sorted_data[j][0][0]
                potential = max(max_len, sample_len) * (j + 1 - beg_idx)
                if (j < n - 1 and sample_len < batch_threshold_ms
                        and potential < batch_ms):
                    max_len = max(max_len, sample_len)
                    end_idx += 1
                    continue
                speech_j, _ = slice_padding_audio_samples(
                    speech, speech_length, sorted_data[beg_idx:end_idx])
                results = self.inference(speech_j, input_len=None, model=self.model,
                                         params=self.model_params, kwargs=kwargs, **cfg)
                if self.spk_model is not None:
                    from funasr_tpu.models.campplus.utils import sv_chunk
                    for _b in range(len(speech_j)):
                        seg0 = sorted_data[beg_idx:end_idx][_b][0]
                        vs = [[seg0[0] / 1000.0, seg0[1] / 1000.0,
                               np.asarray(speech_j[_b])]]
                        segments = sv_chunk(vs)
                        all_segments.extend(segments)
                        spk_res = self.inference([s[2] for s in segments],
                                                 input_len=None, model=self.spk_model,
                                                 params=self.spk_params,
                                                 kwargs=self.spk_kwargs, **cfg)
                        results[_b]["spk_embedding"] = np.concatenate(
                            [np.asarray(rr["spk_embedding"]) for rr in spk_res], 0)
                beg_idx, end_idx = end_idx, end_idx + 1
                max_len = sample_len
                results_sorted.extend(results)

            if len(results_sorted) != n:
                results_ret.append({"key": key, "text": "", "timestamp": []})
                continue
            restored = [None] * n
            for j in range(n):
                restored[sorted_data[j][1]] = results_sorted[j]

            # merge texts / offset timestamps (reference :992-1038)
            result: Dict[str, Any] = {}
            for j in range(n):
                for k, v in restored[j].items():
                    if k.startswith("timestamp"):
                        result.setdefault(k, [])
                        for t in v:
                            t[0] = int(t[0]) + int(vadsegments[j][0])
                            t[1] = int(t[1]) + int(vadsegments[j][0])
                        result[k].extend(v)
                    elif k == "spk_embedding":
                        result[k] = (v if k not in result
                                     else np.concatenate([result[k], v], 0))
                    elif "text" in k:
                        result[k] = v if k not in result else result[k] + " " + v
                    else:
                        result[k] = v if k not in result else result[k] + v

            if not result.get("text", "").strip():
                # still emit one row per input key (reference always emits,
                # funasr/auto/auto_model.py:1040+) so output aligns with inputs
                result.pop("spk_embedding", None)
                result["key"] = key
                result.setdefault("text", "")
                results_ret.append(result)
                continue
            return_raw_text = kwargs.get("return_raw_text", False)

            # step 3: punctuation — the punc model and sentence segmentation
            # consume the _join_vad_texts surface (no space at CJK segment
            # joins), matching reference auto_model.py:1063-1082
            raw_text = None
            punc_array = None
            punc_input_text = _join_vad_texts(
                restored[j].get("text", "") for j in range(n))
            if self.punc_model is not None:
                deep_update(self.punc_kwargs, cfg)
                raw_text = copy.copy(result["text"])
                punc_res = self.inference(punc_input_text, model=self.punc_model,
                                          params=self.punc_params,
                                          kwargs=self.punc_kwargs, **cfg)
                if return_raw_text:
                    result["raw_text"] = raw_text
                result["text"] = punc_res[0]["text"]
                punc_array = punc_res[0].get("punc_array")

            # step 4: speaker clustering + sentence assembly
            if self.spk_model is not None and kwargs.get("return_spk_res", True) \
                    and "spk_embedding" in result:
                from funasr_tpu.models.campplus.utils import (
                    distribute_spk, postprocess as spk_postprocess)
                from funasr_tpu.utils.timestamp_tools import timestamp_sentence
                all_segments = sorted(all_segments, key=lambda x: x[0])
                labels = self.cb_model(
                    np.asarray(result["spk_embedding"]),
                    oracle_num=kwargs.get("preset_spk_num"))
                sv_output = spk_postprocess(all_segments, None, labels,
                                            np.asarray(result["spk_embedding"]))
                if self.spk_mode == "punc_segment" and punc_array is not None:
                    sentence_list = timestamp_sentence(
                        punc_array, result.get("timestamp", []),
                        punc_input_text, return_raw_text=return_raw_text)
                else:
                    sentence_list = [dict(text=result["text"],
                                          start=result["timestamp"][0][0]
                                          if result.get("timestamp") else 0,
                                          end=result["timestamp"][-1][1]
                                          if result.get("timestamp") else 0,
                                          timestamp=result.get("timestamp", []))]
                distribute_spk(sentence_list, sv_output)
                result["sentence_info"] = sentence_list
            elif kwargs.get("sentence_timestamp", False) and punc_array is not None:
                from funasr_tpu.utils.timestamp_tools import timestamp_sentence
                result["sentence_info"] = timestamp_sentence(
                    punc_array, result.get("timestamp", []),
                    punc_input_text or result["text"],
                    return_raw_text=return_raw_text)
            result.pop("spk_embedding", None)

            result["key"] = key
            results_ret.append(result)

        return results_ret

    def export(self, input=None, **cfg):
        """Serialize the model to StableHLO artifacts (reference ``export:1250``
        contract; format is StableHLO-for-PJRT instead of ONNX)."""
        from funasr_tpu.bin.export import export_model
        output_dir = cfg.get("output_dir", "exported")
        buckets = cfg.get("buckets", [(4, 168)])
        return export_model(self.model, self.model_params, output_dir,
                            [tuple(b) for b in buckets])


def _strip(kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Drop orchestration-only keys before forwarding to model.inference."""
    # "key" is carried per-batch (already in ``batch``); a user-level key list
    # merged into kwargs via deep_update would collide with it
    drop = {"model", "model_conf", "init_param", "vad_model", "vad_kwargs",
            "punc_model", "punc_kwargs", "spk_model", "spk_kwargs", "model_path",
            "key"}
    return {k: v for k, v in kwargs.items() if k not in drop}
