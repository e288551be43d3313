"""Mesh + sharding policy: DDP/FSDP/ZeRO/TP collapse into GSPMD sharding specs.

The reference's distributed strategies (FunASR ``funasr/bin/train.py:80-170`` DDP/FSDP,
``train_ds.py`` DeepSpeed ZeRO, vLLM tensor parallel) are replaced by one sharded jit
program: pick a ``Mesh(("data", "model"))``, annotate param/batch shardings, and XLA
inserts the collectives (psum for grads over "data", all-gather/reduce-scatter for the
megatron-style TP splits over "model").

Policy (megatron convention, applied by param-path pattern):
* fused qkv / ffn w_1 / output projections -> column-parallel (shard last dim)
* attention linear_out / ffn w_2            -> row-parallel (shard first dim)
* embeddings / vocab output                  -> shard vocab dim
* norms, convs, biases of row-parallel mats  -> replicated
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None,
              model: int = 1, devices=None) -> Mesh:
    """Create a ("data", "model") mesh. data defaults to n/model."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if data is None:
        data = n // model
    if data < 1 or data * model != n:
        raise ValueError(
            f"cannot build a ({data} data x {model} model) mesh from {n} "
            f"available device(s); pass devices= explicitly (e.g. "
            f"jax.devices('cpu') with XLA_FLAGS="
            f"--xla_force_host_platform_device_count=N for a virtual mesh)")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


# param-path regexes -> (partition spec builder)
_COLUMN = re.compile(
    r"(linear_q_k_v|linear_k_v|linear_q(?![_a-z])|w_1|output_layer|cif_output|ctc_lo)"
)
_ROW = re.compile(r"(linear_out|w_2)")
_EMBED = re.compile(r"(^|/)embed(/|$)")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


def param_pspec(path, leaf, model_axis: str = "model", model_size: int = 1):
    """PartitionSpec for one param leaf given its tree path."""
    name = _path_str(path)
    shape = leaf.shape
    # expert parallelism: stacked MoE expert weights [E, ...] (path
    # .../experts/<proj>/w) shard the expert dim over the model axis; the
    # dense-dispatch einsums then compute only local experts per device and
    # GSPMD inserts the combine psum
    if (model_size > 1 and "/experts/" in f"/{name}" and leaf.ndim >= 3
            and shape[0] % model_size == 0):
        return P(model_axis, *([None] * (leaf.ndim - 1)))
    is_kernel = name.endswith("/w") and leaf.ndim >= 2
    # stacked-layer params have a leading layer axis; the matmul dims are the last 2
    if is_kernel and model_size > 1:
        if _COLUMN.search(name) and shape[-1] % model_size == 0:
            spec = [None] * (leaf.ndim - 1) + [model_axis]
            return P(*spec)
        if _ROW.search(name) and shape[-2] % model_size == 0:
            spec = [None] * (leaf.ndim - 2) + [model_axis, None]
            return P(*spec)
    if (_EMBED.search(name) and name.endswith("/w") and leaf.ndim >= 2
            and model_size > 1 and shape[-2] % model_size == 0):
        spec = [None] * (leaf.ndim - 2) + [model_axis, None]
        return P(*spec)
    # column-parallel bias follows its kernel
    if name.endswith("/b") and model_size > 1 and _COLUMN.search(name) \
            and shape[-1] % model_size == 0:
        spec = [None] * (leaf.ndim - 1) + [model_axis]
        return P(*spec)
    return P()


def param_shardings(params, mesh: Mesh) -> Any:
    """NamedSharding tree for a param pytree under the megatron TP policy."""
    model_size = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, param_pspec(path, leaf, model_size=model_size)),
        params,
    )


def fsdp_param_shardings(params, mesh: Mesh, axis: str = "data",
                         min_size: int = 2 ** 16) -> Any:
    """ZeRO-3-style: additionally shard large params' first dim over the data axis.

    Equivalent role to the reference's FSDP size-based auto-wrap policy
    (``funasr/bin/train.py:139-170``, >=1e5 params per wrapped module).
    """
    n = mesh.shape.get(axis, 1)

    def _spec(path, leaf):
        base = param_pspec(path, leaf, model_size=mesh.shape.get("model", 1))
        first_free = len(base) == 0 or base[0] is None
        if (leaf.size >= min_size and leaf.ndim >= 1 and leaf.shape[0] % n == 0
                and first_free):
            spec = list(base) + [None] * (leaf.ndim - len(base))
            spec[0] = axis
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, base)

    return jax.tree_util.tree_map_with_path(_spec, params)


def opt_state_shardings(opt_state, mesh: Mesh, fsdp: bool = False,
                        axis: str = "data", min_size: int = 2 ** 16) -> Any:
    """NamedSharding tree for an optax opt_state.

    Optimizer moments (adam mu/nu etc.) are param-shaped subtrees whose tree
    paths embed the param path (e.g. ``0/mu/encoder/.../linear_q_k_v/w``), so
    the same path-regex policy as :func:`param_pspec` applies leaf-wise;
    scalars (step counts) come out replicated. With ``fsdp=True`` large moment
    tensors are additionally sharded over the data axis — ZeRO's defining
    property (sharded optimizer state, DeepSpeed ``ds_stage3.json`` role).
    """
    model_size = mesh.shape.get("model", 1)
    n = mesh.shape.get(axis, 1)

    def _spec(path, leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        base = param_pspec(path, leaf, model_size=model_size)
        if fsdp:
            first_free = len(base) == 0 or base[0] is None
            if (leaf.size >= min_size and leaf.ndim >= 1
                    and leaf.shape[0] % n == 0 and first_free):
                spec = list(base) + [None] * (leaf.ndim - len(base))
                spec[0] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, base)

    return jax.tree_util.tree_map_with_path(_spec, opt_state)


def batch_shardings(mesh: Mesh, tree_example) -> Any:
    """Shard every batch array's leading dim over "data"."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))),
        tree_example,
    )


def batch_shardings_sp(mesh: Mesh, tree_example,
                       seq_axis: str = "model") -> Any:
    """Context/sequence-parallel batch specs: batch dim over "data" AND the
    time dim of rank-3 feature arrays over ``seq_axis``.

    The GSPMD form of sequence parallelism (Megatron-SP / ring-attention's
    sharding layout): activations enter the jitted step sharded (B/data,
    T/model, D), frame-local work (FFN projections, norms, the frontend) runs
    time-sharded, and XLA inserts the all-gathers exactly where an op
    genuinely needs the full sequence (attention score matmuls, FSMN convs
    crossing shard edges). Long-audio training memory then scales 1/|model|
    per chip with zero model-code changes — the reference's torchrun DDP has
    no counterpart (its long-audio answer is VAD segmentation only).
    """
    def _spec(x):
        if x.ndim >= 3:
            return NamedSharding(
                mesh, P("data", seq_axis, *([None] * (x.ndim - 2))))
        return NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))

    return jax.tree_util.tree_map(_spec, tree_example)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
