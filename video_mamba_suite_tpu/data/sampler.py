"""Per-host data sharding — the DistributedSampler equivalent.

Every DDP suite in the reference pairs its loader with
`torch.utils.data.DistributedSampler` (action-recognition
run_class_finetuning.py:260, egocentric main_lavila_finetune_mir.py,
dense-captioning train.py DDP path). On TPU, SPMD only shards the DEVICE
work; each host process must still read a disjoint slice of the dataset —
this sampler reproduces the torch semantics (epoch-seeded global
permutation, wrap-around padding to a multiple of the shard count, strided
assignment) keyed on `jax.process_index()` by default.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


def sharded_epoch_order(n: int, epoch: int, seed: int = 0) -> list:
    """Epoch-seeded per-process sample order (DistributedSampler semantics):
    single-process this is a plain shuffled epoch; multi-host each process
    walks ITS disjoint shard, so globally-assembled batches carry distinct
    data. Convenience wrapper over ShardedSampler for epoch loops."""
    s = ShardedSampler(n, shuffle=True, seed=seed)
    s.set_epoch(epoch)
    return list(s)


class ShardedSampler:
    """Deterministic disjoint index shards with epoch-seeded shuffling.

    Mirrors torch DistributedSampler: with shuffle, the global order is a
    permutation seeded by (seed + epoch) — identical on every host — then
    padded by wrap-around to `ceil(n / num_shards) · num_shards` (or
    truncated with drop_last) and dealt out strided (`rank::num_shards`),
    so every host sees the same number of samples and the union covers the
    dataset.
    """

    def __init__(self, num_samples: int, num_shards: Optional[int] = None,
                 shard_index: Optional[int] = None, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = False):
        if num_shards is None or shard_index is None:
            import jax

            num_shards = jax.process_count() if num_shards is None else num_shards
            shard_index = (jax.process_index()
                           if shard_index is None else shard_index)
        if not 0 <= shard_index < num_shards:
            raise ValueError(f"shard_index {shard_index} ∉ [0, {num_shards})")
        self.num_samples = int(num_samples)
        self.num_shards = int(num_shards)
        self.shard_index = int(shard_index)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        if drop_last:
            self.shard_len = self.num_samples // self.num_shards
        else:
            self.shard_len = -(-self.num_samples // self.num_shards)

    def set_epoch(self, epoch: int) -> None:
        """Call once per epoch BEFORE iterating (torch convention) so all
        hosts agree on the epoch's permutation."""
        self.epoch = int(epoch)

    def __len__(self) -> int:
        return self.shard_len

    def __iter__(self) -> Iterator[int]:
        if self.shuffle:
            order = np.random.default_rng(
                self.seed + self.epoch).permutation(self.num_samples)
        else:
            order = np.arange(self.num_samples)
        total = self.shard_len * self.num_shards
        if self.drop_last:
            order = order[:total]
        elif total > len(order):          # wrap-around padding
            order = np.concatenate([order, order[: total - len(order)]])
        return iter(order[self.shard_index :: self.num_shards].tolist())
