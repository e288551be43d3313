"""Pallas depthwise-conv1d (FSMN memory) experiment — negative result.

Bit-exact vs core.layers.depthwise_conv1d_apply but 11% SLOWER at encoder
shapes (B=32, T=256, C=512, k=11): XLA already fuses the k shifted
multiply-adds into one VMEM pass. Third data point (after the w8a8 matmul
and flash-attention-below-T=1024 measurements) that XLA's fusion beats
hand kernels at short-sequence shapes on this chip; kept as the record
behind docs/benchmarks.md.

Run: python benchmarks/bench_pallas_dwconv.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from funasr_tpu.core.layers import depthwise_conv1d_apply

K_SIZE, LEFT, RIGHT = 11, 5, 5

def dw_pallas(x, w, left=LEFT, right=RIGHT):
    B, T, C = x.shape
    k = w.shape[0]
    def kernel(x_ref, w_ref, o_ref):
        xf = x_ref[0].astype(jnp.float32)          # (T, C)
        acc = jnp.zeros((T, C), jnp.float32)
        for j in range(k):
            s = j - left
            if s > 0:
                shifted = jnp.concatenate(
                    [xf[s:], jnp.zeros((s, C), jnp.float32)], axis=0)
            elif s < 0:
                shifted = jnp.concatenate(
                    [jnp.zeros((-s, C), jnp.float32), xf[:s]], axis=0)
            else:
                shifted = xf
            acc = acc + shifted * w_ref[j][None, :]
        o_ref[0] = acc.astype(o_ref.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, C), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        cost_estimate=pl.CostEstimate(flops=2*B*T*C*k,
                                      bytes_accessed=B*T*C*4, transcendentals=0),
    )(x, w)

B, T, C = 32, 256, 512
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, T, C)) * 0.3, jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((K_SIZE, C)) * 0.1, jnp.float32)
p = {"w": w}

gold = np.asarray(depthwise_conv1d_apply(p, x, left_pad=LEFT, right_pad=RIGHT))
got = np.asarray(dw_pallas(x, w))
print("shapes", gold.shape, got.shape, "max err",
      np.abs(gold.astype(np.float32) - got.astype(np.float32)).max())

REP = 50
def loop(fn):
    @jax.jit
    def f(x):
        def body(carry, _):
            x, acc = carry
            y = fn(x)
            return (x + jnp.bfloat16(1e-3), acc + jnp.sum(y.astype(jnp.float32))), None
        (_, acc), _ = jax.lax.scan(body, (x, 0.0), None, length=REP)
        return acc
    return f

def bench(f, *a, iters=3):
    out = f(*a); np.asarray(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters): out = f(*a)
        np.asarray(out)
        best = min(best, (time.perf_counter()-t0)/iters)
    return best / REP

print(f"xla    {bench(loop(lambda x: depthwise_conv1d_apply(p, x, left_pad=LEFT, right_pad=RIGHT)), x)*1e6:8.1f} us")
print(f"pallas {bench(loop(lambda x: dw_pallas(x, w)), x)*1e6:8.1f} us")
