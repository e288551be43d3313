"""Pallas fused-quantize W8A8 matmul experiment (one TPU chip).

Quantizes the activation tile inside VMEM and runs the int8 dot in the same
kernel - measured SLOWER (66.7 TFLOP/s-equiv) than XLA's unfused w8a8
(100.6) at encoder shapes: Mosaic's int8 dot_general lowering underruns
XLA's. Kept as the negative result backing docs/benchmarks.md's roofline
argument.

Run: python benchmarks/bench_pallas_w8a8.py
"""
import sys, time  # noqa: E401, functools
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def w8a8_matmul(x, w_q, sw, *, bm=256, bn=512):
    """y = (rowquant(x) @ w_q) * (sx * sw), quantize fused in VMEM."""
    M, K = x.shape
    K2, N = w_q.shape
    def kernel(x_ref, w_ref, sw_ref, o_ref):
        xf = x_ref[:].astype(jnp.float32)
        ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx = jnp.maximum(ax, 1e-6) * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o_ref[:] = (acc.astype(jnp.float32) * sx * sw_ref[:]
                    ).astype(o_ref.dtype)
    grid = (M // bm, N // bn)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(flops=2*M*K*N, bytes_accessed=M*K*2+K*N+M*N*2,
                                      transcendentals=0),
    )(x, w_q, sw.reshape(1, -1))

M, K, N = 32*256, 512, 2048
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
wf = rng.standard_normal((K, N)).astype(np.float32) * 0.05
s = np.abs(wf).max(0) / 127.0
w_q = jnp.asarray(np.clip(np.round(wf / s), -127, 127), jnp.int8)
sw = jnp.asarray(s, jnp.float32)

# correctness vs XLA w8a8
def xla_w8a8(x, w_q, sw):
    xf = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), -1, keepdims=True)
    sx = jnp.maximum(ax, 1e-6) / 127.
    xq = jnp.clip(jnp.round(xf/sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx*sw)).astype(jnp.bfloat16)

yp = np.asarray(w8a8_matmul(x, w_q, sw))
yx = np.asarray(jax.jit(xla_w8a8)(x, w_q, sw))
err = np.abs(yp.astype(np.float32)-yx.astype(np.float32)).max()
print("max |pallas - xla| =", err)

REP = 50
def looped(f):
    @jax.jit
    def g(x):
        def body(i, acc):
            return acc + jnp.sum(f(x).astype(jnp.float32)[:1, :1])
        return jax.lax.fori_loop(0, REP, body, 0.0)
    return g

def bench(fn, *a, iters=5):
    out = fn(*a); np.asarray(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters): out = fn(*a)
        np.asarray(out)
        best = min(best, (time.perf_counter()-t0)/iters)
    return best

flops = 2*M*K*N*REP
for name, f in [("xla_w8a8", lambda x: xla_w8a8(x, w_q, sw)),
                ("pallas_w8a8", lambda x: w8a8_matmul(x, w_q, sw)),
                ("bf16", lambda x: jnp.matmul(x, jnp.asarray(wf, jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16))]:
    dt = bench(looped(f), x)
    print(f"{name:12s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s-equiv")
