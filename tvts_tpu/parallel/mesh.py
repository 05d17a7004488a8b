"""Device mesh construction.

The reference's only parallelism is NCCL data-parallel DDP plus an embedding
all_gather (SURVEY §2.10). Here the TPU-native layout is a 3-axis
`jax.sharding.Mesh`:

- ``dp``   — pure data parallel (batch sharding; gradient psum comes from AD)
- ``fsdp`` — parameter/optimizer-state sharding (ZeRO-style; also used as a second
  batch axis, replacing the reference's optional DeepSpeed path)
- ``sp``   — sequence/context parallel over the video token axis (extension: the
  reference handles sequence-length pressure only architecturally via tube
  masking + divided attention, SURVEY §2.10; sp shards the T·N token axis so
  longer clips fit, with GSPMD inserting the attention collectives)
- ``tp``   — tensor parallel over attention heads / MLP hidden dim (extension for
  H/14-scale towers; the reference has no TP)

All collectives ride ICI when the mesh is built with the default device order.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "fsdp", "sp", "tp")


def create_mesh(dp: int | None = None, fsdp: int = 1, tp: int = 1,
                sp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % (fsdp * sp * tp) == 0, f"{n} devices not divisible by fsdp*sp*tp"
        dp = n // (fsdp * sp * tp)
    assert dp * fsdp * sp * tp == n, f"mesh {dp}x{fsdp}x{sp}x{tp} != {n} devices"
    shape = (dp, fsdp, sp, tp)
    try:
        mesh_devices = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over both data axes."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
