"""Host→device batch streaming.

Replaces the reference's `torch.utils.data.DataLoader` + `collate_fn` +
per-iteration `data_to_gpu` (SURVEY.md §3.1, boundaries #1/#3). Because
packing already produced fixed-shape contiguous arrays, "loading" is
pure index slicing — the expensive per-batch Python of the reference
(pad, stack, mask) is gone. What remains is:

- epoch shuffling (numpy RNG, deterministic from seed),
- static batch shapes: the tail partial batch is padded with all-zero-
  mask ghost graphs plus a ``graph_valid`` weight vector so evaluation
  stays exact without a second compiled program,
- :func:`prefetch_to_device` — a one-deep pipeline that lands batch
  i+1 on device (async `jax.device_put`) while batch i computes, the
  TPU analog of DataLoader worker prefetch.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import numpy as np

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.data.dataset import PackedDataset


class BatchLoader:
    """Iterates (GraphBatch, graph_valid [B]) epochs over a PackedDataset."""

    def __init__(
        self,
        ds: PackedDataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = False,
        seed: int = 0,
    ):
        self.ds = ds
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.Generator(np.random.Philox(seed))

    def __len__(self) -> int:
        g = len(self.ds)
        if self.drop_last:
            return g // self.batch_size
        return -(-g // self.batch_size)

    def epoch(self) -> Iterator[tuple[GraphBatch, np.ndarray]]:
        g = len(self.ds)
        order = self._rng.permutation(g) if self.shuffle else np.arange(g)
        bs = self.batch_size
        num = len(self)
        for b in range(num):
            idx = order[b * bs : (b + 1) * bs]
            valid = np.ones(bs, np.float32)
            if len(idx) < bs:  # ghost-pad the tail batch
                pad = bs - len(idx)
                idx = np.concatenate([idx, np.zeros(pad, idx.dtype)])
                valid[bs - pad :] = 0.0
            batch = self.ds.slice_batch(idx)
            if valid.min() == 0.0:
                # zero ghost masks so ghost graphs contribute nothing
                batch = batch.replace(mask=batch.mask * valid[:, None])
            yield batch, valid


def prefetch_to_device(
    it: Iterator, sharding: Optional[jax.sharding.Sharding] = None, depth: int = 1
) -> Iterator:
    """Overlap host slicing + H2D transfer with device compute.

    Keeps ``depth`` batches in flight: `jax.device_put` is asynchronous,
    so by the time the train step consumes a batch it is already
    resident (and already laid out per ``sharding`` on a mesh).
    """
    queue: list = []

    def put(item):
        if sharding is None:
            return jax.tree.map(jax.device_put, item)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), item)

    for item in it:
        queue.append(put(item))
        if len(queue) > depth:
            yield queue.pop(0)
    yield from queue
