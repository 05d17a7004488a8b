"""Parameter partitioning rules for the TVTSv2 model family.

Rules are keyed on flax param paths. With a dp-only mesh (fsdp=tp=1) every spec
degenerates to replication, which reproduces the reference's DDP layout
(replicated params + batch-sharded data, base_trainer.py:24-25). With fsdp>1 the
largest axis of each matrix is sharded (ZeRO-3-style, subsuming the reference's
optional DeepSpeed path); with tp>1 attention/MLP follow the Megatron
column->row pattern (a TPU-native extension — the reference has no TP).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tvts_tpu.parallel.mesh import batch_sharding


def param_partition_spec(path: tuple[str, ...], value) -> P:
    name = "/".join(path)
    shape = np.shape(value)
    ndim = len(shape)

    if ndim == 4 and name.endswith("conv1/kernel"):
        return P(None, None, None, "fsdp")
    if ndim == 2:
        # column-parallel: fused qkv and MLP up-projection shard the output dim
        if name.endswith(("qkv/kernel", "c_fc/kernel")):
            return P("fsdp", "tp")
        # row-parallel: attention output and MLP down-projection shard the input dim
        if name.endswith(("attn/proj/kernel", "c_proj/kernel")):
            return P("tp", "fsdp")
        if name.endswith(("token_embedding/embedding",)):
            return P("fsdp", None)
        if name.endswith(("text_projection", "proj")) and not name.endswith("attn/proj"):
            return P("fsdp", None)
        if name.endswith("head/kernel"):  # tiny sort-head classifier
            return P()
        return P()
    if ndim == 1 and name.endswith(("qkv/bias", "c_fc/bias")):
        return P("tp")
    return P()  # biases, LayerNorm, embeddings along small axes


def _divisible(spec: P, shape, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        total = int(np.prod([mesh.shape[a] for a in axes]))
        if dim % total != 0:
            return False
    return True


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching `params` (falls back to replication when a
    dim does not divide the mesh axis)."""

    def spec_for(path, value):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        spec = param_partition_spec(keys, value)
        if not _divisible(spec, np.shape(value), mesh):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch, mesh: Mesh):
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
