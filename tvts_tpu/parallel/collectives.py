"""Explicit collectives for the contrastive loss.

Behavioral contract: reference v2/trainer/trainer.py:41-57 (`AllGather_multi`):
forward = all_gather + concat of per-rank embedding shards; backward = each rank
keeps only the gradient slice for its local shard (gradients flow only through
locally-computed embeddings; the DDP grad all-reduce then averages).

On TPU this exact semantics falls out of jit + AD automatically when the loss is
written over global arrays (train/step.py does that). This module provides the
EXPLICIT shard_map formulation for cases where manual control is wanted (e.g.
mixing with Pallas collectives later), plus a correctness check used in tests:
`jax.lax.all_gather`'s transpose is `psum_scatter`, which IS the
AllGather_multi backward up to the 1/world averaging that DDP applies anyway.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def all_gather_embeddings(embeds: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Inside shard_map: [B_local, D] -> [B_global, D] with slice-gradient AD."""
    return jax.lax.all_gather(embeds, axis_name, axis=0, tiled=True)


def make_gathered_loss(loss_fn, mesh: Mesh, axis_names=("dp", "fsdp")):
    """Wrap a loss over (video_embeds, text_embeds) global matrices into an
    explicit shard_map version operating on batch-sharded inputs.

    loss_fn: (video [N, D], text [M, D]) -> scalar.
    Returns a function over batch-sharded local arrays producing the same scalar
    (replicated), with AllGather_multi gradient semantics.
    """
    spec = P(axis_names)

    @partial(jax.shard_map, mesh=mesh, in_specs=(spec, spec),
             out_specs=P(), check_vma=False)
    def gathered(video_local, text_local):
        video = all_gather_embeddings(video_local, axis_names)
        text = all_gather_embeddings(text_local, axis_names)
        return loss_fn(video, text)

    return gathered


def batch_shard(x, mesh: Mesh, axis_names=("dp", "fsdp")):
    return jax.device_put(x, NamedSharding(mesh, P(axis_names)))
