"""Host->device prefetching.

Overlaps host-side batch prep (decode/tokenize/collate) with device compute by
keeping `size` batches in flight on device — the TPU-native replacement for the
reference's DataLoader pin_memory + non_blocking copies.
"""

from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator

import jax


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       put: Callable | None = None) -> Iterator:
    """Yield batches already placed on device, keeping `size` in flight.

    `put` defaults to jax.device_put; pass a mesh-aware placement (e.g.
    parallel.shard_batch partial) for sharded training.
    """
    put = put or jax.device_put
    queue = collections.deque()
    it = iter(iterator)
    for _ in range(size):
        try:
            queue.append(put(next(it)))
        except StopIteration:
            break
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
