"""Optional Grain-based input pipeline (multi-process, deterministic).

The default loader (data/dataset.py) uses a thread pool — plenty for 224^2
images. For large-scale training, this module wraps the same
ImageScoreDataset / ImageFolderDataset samples in a grain.python.DataLoader:
process-parallel decode, deterministic per-(seed, epoch) shuffling, sharding
by host, and prefetch to keep the device fed (the north-star's "input
pipeline streaming tiles straight to HBM").

Usage:
    it = grain_batch_iterator(dataset, batch_size=32, seed=0, epoch=3,
                              worker_count=8)
    for imgs, scores in it: ...

worker_count=0 (in-process) is the tested default in this build environment:
grain's forked workers re-run the TPU plugin's sitecustomize and crash under
the axon tunnel. On standard hosts, worker_count>0 enables process-parallel
decode.
"""
from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


class _BatchAndStack:
    """Grain batch operation stacking (img, aux) sample tuples."""

    def __init__(self, batch_size: int, drop_remainder: bool, channels_first: bool):
        self.batch_size = batch_size
        self.drop_remainder = drop_remainder
        self.channels_first = channels_first

    def __call__(self, sample_iter):
        buf = []
        for rec in sample_iter:
            buf.append(rec)
            if len(buf) == self.batch_size:
                yield self._stack(buf)
                buf = []
        if buf and not self.drop_remainder:
            yield self._stack(buf)

    def _stack(self, records):
        imgs = np.stack([r.data[0] for r in records])
        if self.channels_first:
            imgs = imgs.transpose(0, 3, 1, 2)
        aux = np.stack([np.asarray(r.data[-1]) for r in records])
        last = records[-1]
        last.data = (imgs, aux)
        return last


def grain_batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    epoch: int = 0,
    drop_last: bool = True,
    worker_count: int = 0,
    shard_index: int = 0,
    shard_count: int = 1,
    channels_first: bool = True,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (images, aux) batches via grain.python.DataLoader.

    `dataset` is any index-addressable source whose __getitem__ returns a
    tuple with the image array first and the per-sample aux (scores or label)
    last — both textmae_tpu dataset classes qualify.
    """
    import grain.python as gp

    sampler = gp.IndexSampler(
        num_records=len(dataset),
        shuffle=shuffle,
        # pair-hashed so (seed, epoch) combinations never collide the way a
        # plain seed+epoch sum does (seed 0/epoch 1 == seed 1/epoch 0)
        seed=int(np.random.SeedSequence([seed, epoch]).generate_state(1)[0]),
        num_epochs=1,
        shard_options=gp.ShardOptions(
            shard_index=shard_index, shard_count=shard_count, drop_remainder=drop_last
        ),
    )
    loader = gp.DataLoader(
        data_source=dataset,
        sampler=sampler,
        operations=[_BatchAndStack(batch_size, drop_last, channels_first)],
        worker_count=worker_count,
    )
    for imgs, aux in iter(loader):
        yield imgs, aux
