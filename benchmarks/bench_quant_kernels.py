"""Kernel-level bf16 vs W8A8 matmul-chain microbench (one TPU chip).

Evidence behind the docs/benchmarks.md int8-roofline section: the dynamic
per-token quantize is a VPU pass per matmul, capping XLA's w8a8 at ~1.22x
bf16 at encoder shapes. Loops run in-program (lax.fori_loop) because the
tunneled chip has a ~1.6 ms per-dispatch floor that would swamp single kernels.

Run: python benchmarks/bench_quant_kernels.py
"""
import sys, time  # noqa: E401
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def bench(fn, *args, iters=5):
    out = fn(*args); np.asarray(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters): out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

M = 32*256
rng = np.random.default_rng(0)
w1 = jnp.asarray(rng.standard_normal((512, 1536))*0.05, jnp.bfloat16)
w2 = jnp.asarray(rng.standard_normal((512, 512))*0.05, jnp.bfloat16)
w3 = jnp.asarray(rng.standard_normal((512, 2048))*0.05, jnp.bfloat16)
w4 = jnp.asarray(rng.standard_normal((2048, 512))*0.05, jnp.bfloat16)
def q8(w):
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), 0)/127.
    return jnp.clip(jnp.round(w/s), -127, 127).astype(jnp.int8), s
w1q, s1 = q8(w1); w2q, s2 = q8(w2); w3q, s3 = q8(w3); w4q, s4 = q8(w4)
x0 = jnp.asarray(rng.standard_normal((M, 512)), jnp.bfloat16)
REP = 50

def dynq(x, wq, s):
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), -1, keepdims=True)
    sx = jnp.maximum(ax, 1e-6)/127.
    xq = jnp.clip(jnp.round(x.astype(jnp.float32)/sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (sx * s)

def chain_bf16_once(x):
    a = jnp.matmul(x, w1, preferred_element_type=jnp.float32)[:, :512].astype(jnp.bfloat16)
    b = jnp.matmul(a, w2, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    c = jnp.matmul(b, w3, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    d = jnp.matmul(jax.nn.relu(c), w4, preferred_element_type=jnp.float32)
    return jnp.tanh(d).astype(jnp.bfloat16)

def chain_w8a8_once(x):
    a = dynq(x, w1q, s1)[:, :512].astype(jnp.bfloat16)
    b = dynq(a, w2q, s2).astype(jnp.bfloat16)
    c = dynq(b, w3q, s3).astype(jnp.bfloat16)
    d = dynq(jax.nn.relu(c), w4q, s4)
    return jnp.tanh(d).astype(jnp.bfloat16)

# weight-only int8 (upcast in matmul)
def chain_w8_once(x):
    def wq_mm(x, wq, s):
        y = jnp.matmul(x, wq.astype(x.dtype), preferred_element_type=jnp.float32)
        return y * s
    a = wq_mm(x, w1q, s1)[:, :512].astype(jnp.bfloat16)
    b = wq_mm(a, w2q, s2).astype(jnp.bfloat16)
    c = wq_mm(b, w3q, s3).astype(jnp.bfloat16)
    d = wq_mm(jax.nn.relu(c), w4q, s4)
    return jnp.tanh(d).astype(jnp.bfloat16)

def looped(once):
    @jax.jit
    def f(x):
        def body(i, x): return once(x)
        return jnp.sum(jax.lax.fori_loop(0, REP, body, x).astype(jnp.float32))
    return f

cf = 2*M*(512*1536+512*512+512*2048+2048*512)*REP
for name, once in [("bf16", chain_bf16_once), ("w8a8", chain_w8a8_once), ("w8", chain_w8_once)]:
    dt = bench(looped(once))(
    ) if False else bench(looped(once), x0)
    print(f"{name:6s} {dt*1e3:8.2f} ms  {cf/dt/1e12:6.1f} TFLOP/s-equiv")
