"""Pipeline parallelism over stacked encoder layers (GPipe schedule).

The reference's answer to models that exceed one accelerator is DeepSpeed
(``funasr/bin/train_ds.py`` + ``examples/.../ds_stage1.json`` — ZeRO sharding,
no pipeline engine); this module adds the TPU-native missing piece: the
homogeneous encoder blocks already run as ONE ``lax.scan`` body over stacked
``[L, ...]`` params (``funasr_tpu/models/sanm/encoder.py``), so the layer axis
is a physical shard axis. ``pipeline_apply`` shards it over a mesh axis with
``shard_map`` and rotates activations stage-to-stage with
``jax.lax.ppermute`` — the collectives ride ICI neighbor links, the classic
TPU pipeline layout (scaling-book §pipelining mental model).

Schedule: GPipe with M microbatches over S stages — ``M + S - 1`` ticks,
bubble fraction ``(S-1)/(M+S-1)``. Backward is plain autodiff through the
scan + ppermute (transpose of a ring permute is the reverse ring), so one
``jax.grad`` differentiates the whole pipeline; activation memory is the
scan's, bounded by ``jax.checkpoint`` on the layer body if needed.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.4.35 moved shard_map to jax.experimental.shard_map
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.shard_map import shard_map  # type: ignore


def pipeline_apply(layer_fn: Callable, stacked_params: Any, x: Any,
                   ctx: Any = None, *, mesh: Mesh, n_micro: int,
                   stage_axis: str = "model", batch_axis: str = "data"):
    """Run ``x`` through all L stacked layers, pipelined over ``stage_axis``.

    ``layer_fn(layer_params, x, ctx_micro) -> x`` is one layer body;
    ``stacked_params`` is a pytree whose leaves have leading dim L (must be
    divisible by the stage count S = mesh.shape[stage_axis]);
    ``x`` is a pytree of float activations with leading batch dim B
    (divisible by ``n_micro``); ``ctx`` is an optional pytree of per-sample
    arrays (masks, lengths) with leading dim B that each stage indexes per
    microbatch but does not transform.

    Numerically identical (up to float reassociation) to
    ``lax.scan(layer_fn)`` over the full stack; differentiable end-to-end.
    """
    S = mesh.shape[stage_axis]
    M = int(n_micro)
    if ctx is None:
        ctx = {}

    dp = mesh.shape.get(batch_axis, 1) if batch_axis else 1

    def _micro(leaf):
        b = leaf.shape[0]
        if b % M or (b // M) % dp:
            raise ValueError(
                f"batch {b} must be divisible by n_micro*{batch_axis} "
                f"({M}*{dp})")
        return leaf.reshape((M, b // M) + leaf.shape[1:])

    xm = jax.tree_util.tree_map(_micro, x)
    ctxm = jax.tree_util.tree_map(_micro, ctx)

    def _bspec(leaf):
        # [M, b, ...]: microbatch dim replicated, batch dim over batch_axis
        ax = batch_axis if (batch_axis and batch_axis in mesh.shape) else None
        return P(None, ax, *([None] * (leaf.ndim - 2)))

    stacked_specs = jax.tree_util.tree_map(
        lambda l: P(stage_axis, *([None] * (l.ndim - 1))), stacked_params)
    x_specs = jax.tree_util.tree_map(_bspec, xm)
    ctx_specs = jax.tree_util.tree_map(_bspec, ctxm)

    @partial(shard_map, mesh=mesh,
             in_specs=(stacked_specs, x_specs, ctx_specs),
             out_specs=x_specs, check_rep=False)
    def run(stacked_local, xm_l, ctx_l):
        s = jax.lax.axis_index(stage_axis)

        def stage(x_in, mb_idx):
            ctx_mb = jax.tree_util.tree_map(lambda c: c[mb_idx], ctx_l)

            def body(a, lp):
                return layer_fn(lp, a, ctx_mb), None

            out, _ = jax.lax.scan(body, x_in, stacked_local)
            return out

        ring = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            state, outbuf = carry
            # microbatch id currently at this stage (clipped in the bubbles;
            # bubble results are never written out)
            mb = jnp.clip(t - s, 0, M - 1)
            inject = jax.tree_util.tree_map(
                lambda l: l[jnp.clip(t, 0, M - 1)], xm_l)
            cur = jax.tree_util.tree_map(
                lambda a, b: jnp.where(s == 0, a, b), inject, state)
            y = stage(cur, mb)
            oidx = jnp.clip(t - (S - 1), 0, M - 1)
            write = jnp.logical_and(s == S - 1, t >= S - 1)
            outbuf = jax.tree_util.tree_map(
                lambda ob, yl: ob.at[oidx].set(jnp.where(write, yl, ob[oidx])),
                outbuf, y)
            nxt = jax.tree_util.tree_map(
                lambda yl: jax.lax.ppermute(yl, stage_axis, ring), y)
            return (nxt, outbuf), None

        zeros = jax.tree_util.tree_map(lambda l: jnp.zeros_like(l[0]), xm_l)
        outbuf0 = jax.tree_util.tree_map(jnp.zeros_like, xm_l)
        (_, outbuf), _ = jax.lax.scan(tick, (zeros, outbuf0),
                                      jnp.arange(M + S - 1))
        # only the last stage holds real outputs; masked psum replicates them
        # across the stage axis (out_specs claim no stage sharding)
        return jax.tree_util.tree_map(
            lambda ob: jax.lax.psum(
                jnp.where(s == S - 1, ob, jnp.zeros_like(ob)), stage_axis),
            outbuf)

    out = run(stacked_params, xm, ctxm)
    return jax.tree_util.tree_map(
        lambda l: l.reshape((l.shape[0] * l.shape[1],) + l.shape[2:]), out)


def make_pipeline_runner(mesh: Mesh, n_micro: int = 2,
                         stage_axis: str = "model",
                         batch_axis: str = "data") -> Callable:
    """Bind mesh/microbatch config into the runner signature encoders accept
    (``runner(layer_fn, stacked_params, x, ctx)``)."""
    def runner(layer_fn, stacked_params, x, ctx=None):
        return pipeline_apply(layer_fn, stacked_params, x, ctx, mesh=mesh,
                              n_micro=n_micro, stage_axis=stage_axis,
                              batch_axis=batch_axis)
    return runner


def pp_param_shardings(params: Any, mesh: Mesh, stage_axis: str = "model",
                       stacked_key: str = "encoders") -> Any:
    """NamedSharding tree for pipeline mode: stacked layer subtrees (tree
    path containing ``stacked_key``) shard their leading layer dim over the
    stage axis; everything else is replicated."""
    S = mesh.shape.get(stage_axis, 1)

    def _path_str(path) -> str:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
        return "/".join(parts)

    def _spec(path, leaf):
        name = _path_str(path)
        if (S > 1 and f"/{stacked_key}/" in f"/{name}/"
                and leaf.ndim >= 1 and leaf.shape[0] % S == 0):
            return NamedSharding(
                mesh, P(stage_axis, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(_spec, params)
