"""Weight-only int8 quantization for serving.

TPU-era counterpart of the reference's ggml/GGUF edge quantization
(FunASR ``runtime/llama.cpp/DESIGN.md`` — 2-8 bit weight quantization for the
Fun-ASR-Nano / SenseVoice / Paraformer edge runtimes). On TPU the win is HBM
bandwidth: autoregressive LLM decode is memory-bound, so storing weights as
int8 with per-output-channel fp32 scales halves the bytes each decode step
streams from HBM. The dequant is algebraically exact to fold AFTER the matmul
(`(x @ w_q) * scale` — scale is per output column), so XLA keeps the int8
tensor in HBM, upcasts tiles on the fly, and fuses the scale into the matmul
epilogue.

Usage:
    params_q = quantize_params_int8(params)          # tree-walk linears
    y = qlinear(p, x)                                 # {"w"} or {"w_q","scale"}

Accuracy: per-channel symmetric int8 on weights only (activations stay bf16);
max relative weight error 1/255 per channel — ≤1e-2 output drift on Qwen-style
blocks (tests/test_quant.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_linear_int8(p, key: str = "w_q"):
    """{"w": (..., in, out) f32[, "b"]} -> {key: int8, "scale": (..., out,) f32[, "b"]}.

    Handles both flat ``(in, out)`` linears and layer-stacked ``(L, in, out)``
    kernels (the ``lax.scan`` stacks used by the SANM encoder/decoder): the
    per-output-channel scale reduces over the input axis only, so scan slicing
    yields a per-layer ``(in, out)`` int8 + ``(out,)`` scale pair."""
    w = p["w"]
    scale = jnp.max(jnp.abs(w), axis=-2) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    out = {key: w_q, "scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def dequantize_linear_int8(p):
    """Inverse of :func:`quantize_linear_int8` (for inspection/tests)."""
    w_q = p.get("w_q", p.get("w_q8"))
    w = w_q.astype(jnp.float32) * p["scale"][..., None, :]
    out = {"w": w}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _quantize_rows_int8(x):
    """Dynamic symmetric per-row (per-token) activation quantization.

    x: (..., K) float -> (x_q int8, sx f32 (..., 1)) with x ~= x_q * sx."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(ax, 1e-6) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return x_q, sx


def qlinear(p, x, *, preferred_element_type=jnp.float32):
    """Linear apply for plain or int8-quantized param dicts. Output in x.dtype.

    Three layouts:
      {"w"}            — plain float matmul.
      {"w_q","scale"}  — weight-only int8 (bandwidth play; activations stay
                         bf16, weights upcast on the fly).
      {"w_q8","scale"} — W8A8 compute play: activations are dynamically
                         per-token int8-quantized and the matmul runs
                         int8 x int8 -> int32 on the MXU's double-rate int8
                         path (~1.7x bf16 on chained encoder matmuls, v5e).
                         Scales fold into the epilogue:
                         y = (x_q @ w_q) * (sx * sw) + b.
    """
    if "w_q8" in p:
        x_q, sx = _quantize_rows_int8(x)
        y = jax.lax.dot_general(
            x_q, p["w_q8"], (((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * p["scale"])
        if "b" in p:
            y = y + p["b"].astype(jnp.float32)
        return y.astype(x.dtype)
    if "w_q" in p:
        # measured on v5e (0.5B Qwen decode chain): XLA's own int8-upcast
        # lowering (2.47 ms/tok) beats a hand-written Pallas W8A16 tile kernel
        # (3.43 ms/tok) at decode shapes — XLA pipelines the convert across
        # grid steps better. Keep the plain lowering.
        y = jnp.matmul(x, p["w_q"].astype(x.dtype),
                       preferred_element_type=preferred_element_type)
        y = y * p["scale"].astype(y.dtype)
    else:
        y = jnp.matmul(x, p["w"].astype(x.dtype),
                       preferred_element_type=preferred_element_type)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y.astype(x.dtype)


# 3-D {"w"} dicts are ambiguous: a conv kernel (kernel, in, out) and a
# lax.scan-stacked linear (L, in, out) look alike. Stacked kernels only
# quantize when their dict key is a known linear name.
_LINEAR3_KEYS = frozenset({
    "linear_q_k_v", "linear_out", "linear_q", "linear_k_v", "w_1", "w_2",
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
    "down_proj",
})


def _is_linear_node(node, name: str = "") -> bool:
    if not (isinstance(node, dict) and "w" in node
            and hasattr(node["w"], "ndim") and set(node) <= {"w", "b"}):
        return False
    if node["w"].ndim == 2:
        return True
    return node["w"].ndim == 3 and name in _LINEAR3_KEYS


def quantize_params_int8(params, min_dim: int = 256, mode: str = "weight_only"):
    """Tree-walk: quantize every linear-shaped {"w"[, "b"]} dict whose smaller
    matmul dimension is >= ``min_dim`` (small heads/norms stay fp32 — their
    bytes are negligible and their precision matters more).

    ``mode``: "weight_only" (int8 weights, bf16 activations — HBM bandwidth
    play for memory-bound decode) or "w8a8" (int8 weights + dynamic per-token
    int8 activations — compute play for batched offline serving; matmuls run
    on the MXU's double-rate int8 path). Layer-stacked ``(L, in, out)`` scan
    kernels quantize per layer; embedding tables (any subtree whose key
    mentions "embed") are lookups, not matmuls, and are never touched.

    The final logits projection (``output_layer`` / ``lm_head``) is the most
    accuracy-sensitive matmul (per-token int8 activations there directly
    reorder token argmax), so under "w8a8" it stays weight-only int8 — the
    vLLM / TensorRT-LLM W8A8 recipe. Same bandwidth saving, bf16 activations."""
    key = {"weight_only": "w_q", "w8a8": "w_q8"}[mode]

    def walk(node, name=""):
        if "embed" in name:
            return node
        if _is_linear_node(node, name) and min(node["w"].shape[-2:]) >= min_dim:
            k = "w_q" if name in ("output_layer", "lm_head") else key
            return quantize_linear_int8(node, key=k)
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, name) for v in node]
        if isinstance(node, tuple):
            return tuple(walk(v, name) for v in node)
        return node

    return walk(params)


def quantized_bytes(params) -> int:
    """Total parameter bytes (for reporting compression)."""
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params)
               if hasattr(x, "dtype"))
