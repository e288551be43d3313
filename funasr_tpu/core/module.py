"""Pytree utilities for the functional layer system."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stack_params(param_list):
    """Stack a list of identically-shaped param pytrees along a new leading axis.

    Used to drive homogeneous layer stacks with ``jax.lax.scan`` instead of unrolling —
    one compiled layer body regardless of depth (50-block encoders compile fast).
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *param_list)


def unstack_params(stacked, n: int):
    """Inverse of :func:`stack_params` (host-side; used by checkpoint converters)."""
    return [jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(n)]


def maybe_dropout(rng, x, rate: float):
    """Inverted dropout; identity when ``rng is None`` (inference) or rate == 0."""
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def cast_floats(params, dtype):
    """Cast floating-point leaves to ``dtype`` (e.g. bf16 weights for serving)."""
    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(_cast, params)
