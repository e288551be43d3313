"""Pure artifact-loader inference: run exported models without model code.

Counterpart of the reference's ``funasr_onnx`` pip package
(FunASR ``runtime/python/onnxruntime/funasr_onnx/paraformer_bin.py`` etc. —
inference from exported graphs + sidecar files, no training codebase): this
loader deserializes the ``jax.export`` StableHLO functions written by
``funasr-tpu-export`` plus the sidecars (config.yaml for the frontend,
tokens.txt, am.mvn) and transcribes audio. Nothing from ``funasr_tpu.models``
is imported — the neural compute is the serialized artifact itself, so this is
the deployment path where model code updates cannot change serving behavior.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np


class ExportedModel:
    """``ExportedModel(dir).transcribe(wavs) -> [text, ...]``."""

    def __init__(self, export_dir: str):
        from jax import export as jexport
        import yaml

        with open(os.path.join(export_dir, "export_manifest.json")) as f:
            manifest = json.load(f)
        assert manifest.get("format") == "stablehlo", manifest.get("format")
        self.functions = []
        for entry in manifest["functions"]:
            with open(os.path.join(export_dir, entry["file"]), "rb") as f:
                exported = jexport.deserialize(bytearray(f.read()))
            self.functions.append({**entry, "call": exported.call})
        self.functions.sort(key=lambda e: (e["batch"], e["frames"]))

        cfg_path = os.path.join(export_dir, "config.yaml")
        self.config = yaml.safe_load(open(cfg_path)) if os.path.exists(cfg_path) \
            else {}
        self.tokens: Optional[List[str]] = None
        tok_path = os.path.join(export_dir, "tokens.txt")
        if os.path.exists(tok_path):
            self.tokens = open(tok_path, encoding="utf-8").read().splitlines()

        # the exported function captured the params as constants? No — export
        # serialized fn(params, speech, lens); params ship separately.
        params_path = os.path.join(export_dir, "params.npz")
        self.params = None
        if os.path.exists(params_path):
            self.params = _unflatten_npz(np.load(params_path))

        from funasr_tpu.frontends.wav_frontend import WavFrontend
        fconf = dict(self.config.get("frontend_conf") or {})
        cmvn = os.path.join(export_dir, "am.mvn")
        if os.path.exists(cmvn):
            fconf["cmvn_file"] = cmvn
        self.frontend = WavFrontend(**fconf)

    def _pick(self, b: int, t: int):
        for e in self.functions:
            if e["batch"] >= b and e["frames"] >= t:
                return e
        return self.functions[-1]

    def transcribe(self, wavs, fs: int = 16000) -> List[str]:
        """wavs: list of 1-D float waveforms or file paths -> texts."""
        import jax.numpy as jnp
        from funasr_tpu.utils.load_utils import load_audio_text_image_video

        audio = load_audio_text_image_video(list(wavs), fs=self.frontend.fs,
                                            audio_fs=fs)
        if not getattr(self.frontend, "supports_pcm16", False):
            from funasr_tpu.utils.load_utils import as_unit_f32
            audio = [as_unit_f32(a) for a in audio]
        feats, lens = self.frontend.extract(audio)
        b, t, _ = feats.shape
        e = self._pick(b, t)
        if t > e["frames"]:
            feats = feats[:, : e["frames"]]
            lens = np.minimum(lens, e["frames"])
        padded = np.zeros((e["batch"], e["frames"], feats.shape[-1]), np.float32)
        padded[:b, :t] = feats
        plens = np.zeros((e["batch"],), np.int32)
        plens[:b] = lens
        if self.params is None:
            raise RuntimeError(
                "params.npz missing from the export dir — re-export with a "
                "funasr-tpu-export version that writes params")
        yseq, token_lens, _ = e["call"](self.params, jnp.asarray(padded),
                                        jnp.asarray(plens))
        yseq = np.asarray(yseq)
        token_lens = np.asarray(token_lens)
        out = []
        for i in range(b):
            ids = [int(x) for x in yseq[i, : token_lens[i]] if x > 2]
            if self.tokens:
                out.append("".join(self.tokens[j] for j in ids
                                   if j < len(self.tokens)))
            else:
                out.append(" ".join(map(str, ids)))
        return out


def _flatten_params(params, prefix=""):
    flat = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(_flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(_flatten_params(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def _unflatten_npz(npz):
    root: dict = {}
    for key in npz.files:
        node = root
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = npz[key]
    return _listify(root)


def _listify(node):
    """Dicts whose keys are 0..n-1 ints become lists (round-trip of list params)."""
    if not isinstance(node, dict):
        return node
    out = {k: _listify(v) for k, v in node.items()}
    if out and all(k.isdigit() for k in out):
        idx = sorted(out, key=int)
        if [int(i) for i in idx] == list(range(len(idx))):
            return [out[i] for i in idx]
    return out


def save_params_npz(params, path: str):
    """Write a params pytree as a flat npz (used by funasr-tpu-export)."""
    np.savez(path, **_flatten_params(params))


# ---------------------------------------------------------------------------
# FTR export: weights for the pure-C++ native engine
# (runtime/funasr_tpu_runtime/src/{ftr,paraformer-engine}.cc)
# ---------------------------------------------------------------------------

_QUANT_MIN_SIZE = 4096  # only matmul-sized tensors are worth int8


def _ftr_meta(model) -> dict:
    """Flat key->value meta for the C++ engine (Paraformer-family models)."""
    enc, dec, pred = model.encoder.cfg, model.decoder.cfg, model.predictor.cfg
    meta = {
        "model": type(model).__name__,
        "input_size": enc.input_size,
        "encoder.output_size": enc.output_size,
        "encoder.attention_heads": enc.attention_heads,
        "encoder.linear_units": enc.linear_units,
        "encoder.num_blocks": enc.num_blocks,
        "encoder.kernel_size": enc.kernel_size,
        "encoder.sanm_shift": enc.sanm_shift,
        "decoder.attention_heads": dec.attention_heads,
        "decoder.linear_units": dec.linear_units,
        "decoder.num_blocks": dec.num_blocks,
        "decoder.att_layer_num": dec.att_layer_num,
        "decoder.kernel_size": dec.kernel_size,
        "decoder.sanm_shift": dec.sanm_shift,
        "vocab_size": model.vocab_size,
        "blank_id": model.blank_id,
        "sos": model.sos,
        "eos": model.eos,
        "predictor.l_order": pred.l_order,
        "predictor.r_order": pred.r_order,
        "predictor.tail_threshold": pred.tail_threshold,
        "predictor.smooth_factor": pred.smooth_factor,
        "predictor.noise_threshold": pred.noise_threshold,
    }
    if hasattr(model.predictor, "upsample_times"):  # CifPredictorV3 (BiCif)
        meta["predictor.upsample_times"] = model.predictor.upsample_times
        meta["predictor.upsample_type"] = model.predictor.upsample_type
        meta["predictor.use_cif1_cnn"] = int(model.predictor.use_cif1_cnn)
        meta["predictor.smooth_factor2"] = model.predictor.smooth_factor2
        meta["predictor.noise_threshold2"] = model.predictor.noise_threshold2
    return meta


def _unstack_for_ftr(params, model):
    """Expand scan-stacked layer arrays to per-layer entries ("encoders.{i}")."""
    from funasr_tpu.core.module import unstack_params

    out = dict(params)
    enc = dict(out["encoder"])
    if "encoders" in enc:
        n = model.encoder.cfg.num_blocks - 1
        for i, layer in enumerate(unstack_params(enc.pop("encoders"), n)):
            enc[f"encoders.{i}"] = layer
    out["encoder"] = enc
    dec = dict(out["decoder"])
    if "decoders" in dec:
        n = model.decoder.cfg.att_layer_num
        for i, layer in enumerate(unstack_params(dec.pop("decoders"), n)):
            dec[f"decoders.{i}"] = layer
    if "decoders2" in dec:
        n = model.decoder.cfg.num_blocks - model.decoder.cfg.att_layer_num
        for i, layer in enumerate(unstack_params(dec.pop("decoders2"), n)):
            dec[f"decoders2.{i}"] = layer
    out["decoder"] = dec
    return out


# sub-4-bit group sizes (ggml K-quant block role): picked so the per-group
# scale/min overhead keeps the effective rates strictly ordered —
# int3 = 64*3/8+4 bytes = 3.5 bpw, int2 = 128*2/8+8 bytes = 2.5 bpw
# (ggml Q3_K 3.44 / Q2_K 2.56 bpw ballpark)
_GROUP3 = 64
_GROUP2 = 128


def _group_quant_sym(arr: np.ndarray, levels: int, group: int = _GROUP3):
    """Flat row-major groups, symmetric: scale = absmax/levels,
    q in [-levels, levels]. Returns (flat padded values, q int8, scales)."""
    v = np.asarray(arr, np.float32).reshape(-1)
    pad = -v.size % group
    if pad:
        v = np.concatenate([v, np.zeros((pad,), np.float32)])
    g = v.reshape(-1, group)
    scales = np.maximum(np.abs(g).max(axis=1), 1e-12) / float(levels)
    q = np.clip(np.round(g / scales[:, None]), -levels, levels).astype(np.int8)
    return v, q.reshape(-1), scales.astype(np.float32)


def _pack3(q: np.ndarray) -> np.ndarray:
    """int3 packing: (q+3) in [0, 6] -> 8 values per 3 bytes (24 bits)."""
    u = (q.astype(np.int16) + 3).astype(np.uint32)
    pad = -u.size % 8
    if pad:
        u = np.concatenate([u, np.zeros((pad,), np.uint32)])
    u = u.reshape(-1, 8)
    word = np.zeros((u.shape[0],), np.uint32)
    for j in range(8):
        word |= u[:, j] << np.uint32(3 * j)
    out = np.zeros((u.shape[0], 3), np.uint8)
    out[:, 0] = word & 0xFF
    out[:, 1] = (word >> np.uint32(8)) & 0xFF
    out[:, 2] = (word >> np.uint32(16)) & 0xFF
    return out.reshape(-1)


def _group_quant_asym2(arr: np.ndarray, group: int = _GROUP2):
    """Flat groups, asymmetric 2-bit: v ~= q*scale + min, q in [0, 3].
    Returns (q uint8 flat padded to a group multiple, scales, mins)."""
    v = np.asarray(arr, np.float32).reshape(-1)
    pad = -v.size % group
    if pad:
        v = np.concatenate([v, np.zeros((pad,), np.float32)])
    g = v.reshape(-1, group)
    mins = g.min(axis=1)
    scales = np.maximum((g.max(axis=1) - mins) / 3.0, 1e-12)
    q = np.clip(np.round((g - mins[:, None]) / scales[:, None]), 0, 3)
    return (q.astype(np.uint8).reshape(-1), scales.astype(np.float32),
            mins.astype(np.float32))


def _write_ftr(path: str, meta: dict, flat: dict, quant: str = None):
    """Serialize a flat name->array dict in the FTR container format
    (runtime/funasr_tpu_runtime/src/ftr.h layout)."""
    import struct

    meta_str = "".join(f"{k} {v}\n" for k, v in meta.items()).encode()
    with open(path, "wb") as f:
        f.write(b"FTR1")
        f.write(struct.pack("<I", len(meta_str)))
        f.write(meta_str)
        f.write(struct.pack("<I", len(flat)))
        for name, arr in flat.items():
            arr = np.asarray(arr, np.float32)
            name_b = name.encode()
            f.write(struct.pack("<I", len(name_b)))
            f.write(name_b)
            # embedding tables are row-gathered (not matmul'd) by the C++
            # engines and must stay fp32; depthwise-conv kernels
            # (fsmn_block/w K x C, VAD conv_left/right) are consumed raw via
            # WTensor.f32 by DepthwiseConv1d, never through the
            # int8-aware MatMul, so they must not be quantized either
            is_embed = name.startswith("embed/") or "/embed/" in name
            is_raw_f32 = name.endswith(("fsmn_block/w", "conv_left/w",
                                        "conv_right/w"))
            do_quant = (quant in ("int8", "int4", "int3", "int2")
                        and arr.ndim == 2
                        and name.endswith("/w")
                        and not is_embed and not is_raw_f32
                        and arr.size >= _QUANT_MIN_SIZE)
            dtype_flag = (0 if not do_quant else
                          {"int8": 1, "int4": 2, "int3": 3, "int2": 4}[quant])
            f.write(struct.pack("<BB", dtype_flag, arr.ndim))
            f.write(np.asarray(arr.shape, "<i8").tobytes())
            if dtype_flag == 1:
                scales = np.maximum(np.abs(arr).max(axis=0), 1e-12) / 127.0
                q = np.clip(np.round(arr / scales[None, :]), -127, 127).astype(np.int8)
                f.write(struct.pack("<q", scales.size))
                f.write(scales.astype("<f4").tobytes())
                f.write(q.tobytes())
            elif dtype_flag == 2:
                # int4 (ggml-Q4 role): values in [-7, 7], per-output-channel
                # scale absmax/7; nibble-packed pairs in flat row-major order
                # (low nibble = even index). The C++ loader expands to int8 in
                # memory and feeds the same AMX int8 microkernel (ftr.cc).
                scales = np.maximum(np.abs(arr).max(axis=0), 1e-12) / 7.0
                q = np.clip(np.round(arr / scales[None, :]), -7, 7).astype(
                    np.int8).reshape(-1)
                if q.size % 2:
                    q = np.concatenate([q, np.zeros((1,), np.int8)])
                lo = (q[0::2] & 0x0F).astype(np.uint8)
                hi = (q[1::2] & 0x0F).astype(np.uint8)
                packed = lo | (hi << np.uint8(4))
                f.write(struct.pack("<q", scales.size))
                f.write(scales.astype("<f4").tobytes())
                f.write(packed.astype(np.uint8).tobytes())
            elif dtype_flag == 3:
                # int3 (ggml-Q3 role): GROUP-wise symmetric — per-channel
                # scales are too coarse below 4 bits. Groups of 64 along flat
                # row-major order, scale = absmax/3, q in [-3, 3]; (q+3)
                # packed 8 values -> 3 bytes (3.5 bpw incl. scales). The C++
                # loader reconstructs f32 then requantizes per-column int8 so
                # the AMX GEMM path is shared (2-3 bit is an install-size
                # play; ggml likewise dequantizes K-quants for compute).
                flat_v, groups, scales = _group_quant_sym(arr, levels=3)
                f.write(struct.pack("<q", scales.size))
                f.write(scales.astype("<f4").tobytes())
                f.write(_pack3(groups).tobytes())
            elif dtype_flag == 4:
                # int2 (ggml-Q2 role): group-wise ASYMMETRIC (scale + min per
                # 128-group; 4 levels can't afford to spend one on symmetry).
                # v ~= q * scale + min, q in [0, 3], 4 per byte (2.5 bpw).
                q, scales, mins = _group_quant_asym2(arr)
                f.write(struct.pack("<q", scales.size))
                f.write(scales.astype("<f4").tobytes())
                f.write(mins.astype("<f4").tobytes())
                b0 = q[0::4] | (q[1::4] << np.uint8(2)) \
                    | (q[2::4] << np.uint8(4)) | (q[3::4] << np.uint8(6))
                f.write(b0.astype(np.uint8).tobytes())
            else:
                f.write(arr.astype("<f4").tobytes())
    return path


def export_ftr(model, params, path: str, quant: str = None,
               extra_meta: dict = None):
    """Write a ``weights.ftr`` for the C++ engine.

    quant="int8": weight-only per-output-channel symmetric int8 for 2D matmul
    kernels (the ggml-Q8 role, reference runtime/llama.cpp/DESIGN.md); norms,
    biases, convs stay fp32. quant="int4": nibble-packed [-7,7] weights
    (the ggml-Q4 role) — half the int8 file size; the C++ loader expands to
    int8 in memory so the AMX TMUL path is shared.
    """
    flat = _flatten_params(_unstack_for_ftr(params, model))
    meta = _ftr_meta(model)
    meta.update(extra_meta or {})
    return _write_ftr(path, meta, flat, quant=quant)


def export_vad_ftr(model, params, path: str, extra_meta: dict = None):
    """Write a ``vad.ftr`` for the C++ FSMN-VAD engine
    (runtime/funasr_tpu_runtime/src/vad-engine.cc): the FSMN scoring network
    plus the VADXOptions the windowed endpoint detector needs."""
    c = model.encoder.cfg
    o = model.vad_opts
    meta = {
        "model": "FsmnVADStreaming",
        "input_dim": c.input_dim, "input_affine_dim": c.input_affine_dim,
        "fsmn_layers": c.fsmn_layers, "linear_dim": c.linear_dim,
        "proj_dim": c.proj_dim, "lorder": c.lorder, "rorder": c.rorder,
        "output_affine_dim": c.output_affine_dim, "output_dim": c.output_dim,
        "n_mels": 80, "lfr_m": 5, "lfr_n": 1,
        "window_size_ms": o.window_size_ms,
        "sil_to_speech_time_thres": o.sil_to_speech_time_thres,
        "speech_to_sil_time_thres": o.speech_to_sil_time_thres,
        "max_end_silence_time": o.max_end_silence_time,
        "max_single_segment_time": o.max_single_segment_time,
        "speech_noise_thres": o.speech_noise_thres,
        "speech_2_noise_ratio": o.speech_2_noise_ratio,
        "sil_pdf_id": o.sil_pdf_ids[0] if o.sil_pdf_ids else 0,
    }
    meta.update(extra_meta or {})
    flat = {}
    enc = params["encoder"]
    for name in ("in_linear1", "in_linear2", "out_linear1", "out_linear2"):
        for part, v in enc[name].items():
            flat[f"encoder/{name}/{part}"] = v
    for i, bp in enumerate(enc["fsmn"]):
        for mod, tree in bp.items():
            for part, v in tree.items():
                flat[f"encoder/fsmn.{i}/{mod}/{part}"] = v
    return _write_ftr(path, meta, flat)


def export_punc_ftr(model, params, path: str, token_list=None,
                    quant: str = None, extra_meta: dict = None):
    """Write a ``punc.ftr`` for the C++ CT-Transformer punctuation engine
    (runtime/funasr_tpu_runtime/src/punc-engine.cc): embedding + SAN-M encoder
    + punc classifier, plus the punc symbol table in the meta block. With
    ``token_list``, also writes ``punc_tokens.txt`` next to the ftr (the
    text->id vocabulary the C++ tokenizer consumes)."""
    import os

    from funasr_tpu.core.module import unstack_params

    cfg = model.encoder.cfg
    meta = {
        "model": type(model).__name__,
        "embed_unit": model.embed_unit, "att_unit": model.att_unit,
        "n_punc": len(model.punc_list),
        "sentence_end_id": model.sentence_end_id,
        # CTTransformerStreaming uses the VAD-masked encoder (causal blocks +
        # vad-corner last block) -> the C++ engine's EncodeVad path
        "vad_encoder": int(type(model.encoder).__name__ == "SANMVadEncoder"),
        "encoder.attention_heads": cfg.attention_heads,
        "encoder.linear_units": cfg.linear_units,
        "encoder.num_blocks": cfg.num_blocks,
        "encoder.kernel_size": cfg.kernel_size,
        "encoder.sanm_shift": cfg.sanm_shift,
    }
    for i, p in enumerate(model.punc_list):
        meta[f"punc_{i}"] = p
    meta.update(extra_meta or {})

    enc = dict(params["encoder"])
    if "encoders" in enc:
        for i, layer in enumerate(unstack_params(enc.pop("encoders"),
                                                 cfg.num_blocks - 1)):
            enc[f"encoders.{i}"] = layer
    flat = _flatten_params({"embed": params["embed"], "encoder": enc,
                            "decoder": params["decoder"]})
    _write_ftr(path, meta, flat, quant=quant)
    if token_list is not None:
        with open(os.path.join(os.path.dirname(path) or ".",
                               "punc_tokens.txt"), "w") as f:
            f.write("\n".join(token_list) + "\n")
    return path


def export_sensevoice_ftr(model, params, path: str, quant: str = None,
                          extra_meta: dict = None):
    """Write a ``weights.ftr`` for the C++ SenseVoice engine
    (runtime/funasr_tpu_runtime/src/sensevoice-engine.cc): query-embedding
    table + SAN-M encoder with tp tail + CTC head."""
    from funasr_tpu.core.module import unstack_params

    cfg = model.encoder.cfg
    meta = {
        "model": "SenseVoiceSmall",
        "input_size": cfg.input_size,
        "encoder.output_size": cfg.output_size,
        "encoder.attention_heads": cfg.attention_heads,
        "encoder.linear_units": cfg.linear_units,
        "encoder.num_blocks": cfg.num_blocks,
        "encoder.kernel_size": cfg.kernel_size,
        "encoder.sanm_shift": cfg.sanm_shift,
        "encoder.tp_blocks": model.encoder.tp_blocks,
        "vocab_size": model.vocab_size,
        "blank_id": model.blank_id,
    }
    meta.update(extra_meta or {})
    enc = dict(params["encoder"])
    if "encoders" in enc:
        for i, layer in enumerate(unstack_params(enc.pop("encoders"),
                                                 cfg.num_blocks - 1)):
            enc[f"encoders.{i}"] = layer
    if "tp_encoders" in enc:
        for i, layer in enumerate(unstack_params(enc.pop("tp_encoders"),
                                                 model.encoder.tp_blocks)):
            enc[f"tp_encoders.{i}"] = layer
    flat = _flatten_params({"embed": params["embed"], "encoder": enc,
                            "ctc": params["ctc"]})
    return _write_ftr(path, meta, flat, quant=quant)


def export_native_dir(model, params, model_dir: str, output_dir: str,
                      quant: str = None):
    """Package a model dir for the C++ runtime: weights.ftr + tokens.txt + am.mvn.

    ``model_dir`` supplies tokens/cmvn (a hub snapshot or local config dir).
    """
    import shutil

    os.makedirs(output_dir, exist_ok=True)
    frontend_meta = {}
    import yaml
    cfg_path = os.path.join(model_dir, "config.yaml")
    if os.path.exists(cfg_path):
        with open(cfg_path, encoding="utf-8") as f:
            cfg = yaml.safe_load(f) or {}
        fc = cfg.get("frontend_conf", {})
        frontend_meta = {"lfr_m": fc.get("lfr_m", 7), "lfr_n": fc.get("lfr_n", 6),
                         "n_mels": fc.get("n_mels", 80)}
    exporter = (export_sensevoice_ftr
                if type(model).__name__ == "SenseVoiceSmall" else export_ftr)
    exporter(model, params, os.path.join(output_dir, "weights.ftr"),
             quant=quant, extra_meta=frontend_meta)
    for name in ("tokens.txt", "am.mvn"):
        src = os.path.join(model_dir, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(output_dir, name))
    return output_dir
