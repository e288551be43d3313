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


def quantize_linear_int8(p):
    """{"w": (in, out) f32[, "b"]} -> {"w_q": int8, "scale": (out,) f32[, "b"]}."""
    w = p["w"]
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def dequantize_linear_int8(p):
    """Inverse of :func:`quantize_linear_int8` (for inspection/tests)."""
    w = p["w_q"].astype(jnp.float32) * p["scale"][None, :]
    out = {"w": w}
    if "b" in p:
        out["b"] = p["b"]
    return out


def qlinear(p, x, *, preferred_element_type=jnp.float32):
    """Linear apply for plain or int8-quantized param dicts. Output in x.dtype."""
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


def _is_linear_node(node) -> bool:
    return (isinstance(node, dict) and "w" in node
            and hasattr(node["w"], "ndim") and node["w"].ndim == 2
            and set(node) <= {"w", "b"})


def quantize_params_int8(params, min_dim: int = 256):
    """Tree-walk: quantize every linear-shaped {"w"[, "b"]} dict whose smaller
    weight dimension is >= ``min_dim`` (small heads/norms stay fp32 — their
    bytes are negligible and their precision matters more)."""

    def walk(node):
        if _is_linear_node(node) and min(node["w"].shape) >= min_dim:
            return quantize_linear_int8(node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, tuple):
            return tuple(walk(v) for v in node)
        return node

    return walk(params)


def quantized_bytes(params) -> int:
    """Total parameter bytes (for reporting compression)."""
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params)
               if hasattr(x, "dtype"))
