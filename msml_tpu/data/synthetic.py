"""Synthetic batch generator for smoke tests and throughput benchmarking.

Produces batches with the exact contract of the real pipeline
(`datasets/load_dataset.py:101-139`): img (occluded, normalized), msk (binary
occlusion map), ori (clean image for KD), label.
"""

from __future__ import annotations

import numpy as np


def synthetic_batch(batch_size: int, size: int = 112, channels: int = 3,
                    num_classes: int = 1000, seed: int = 0,
                    uint8: bool = False):
    """uint8=True yields raw uint8 images (the device_light-mode contract:
    relight + normalize happen inside the jitted step)."""
    rng = np.random.RandomState(seed)
    if uint8:
        img = rng.randint(0, 256, (batch_size, size, size, channels),
                          dtype=np.uint8)
        ori = rng.randint(0, 256, (batch_size, size, size, channels),
                          dtype=np.uint8)
    else:
        img = rng.randn(batch_size, size, size, channels).astype(np.float32)
        ori = rng.randn(batch_size, size, size, channels).astype(np.float32)
    # mask polarity matches the real pipeline: 1 = clean, 0 = occluded
    # (reference masks are 255 clean / 0 occluded, rand_occ.py:598-601)
    msk = np.ones((batch_size, size, size), np.int32)
    for i in range(batch_size):
        if rng.rand() < 0.8:  # most samples occluded, like training
            h0, w0 = rng.randint(0, size // 2, 2)
            hh, ww = rng.randint(size // 8, size // 2, 2)
            msk[i, h0:h0 + hh, w0:w0 + ww] = 0
    label = rng.randint(0, num_classes, batch_size).astype(np.int32)
    return {"img": img, "msk": msk, "ori": ori, "label": label}


class SyntheticDataset:
    """Iterable synthetic dataset with a fixed number of steps per epoch."""

    def __init__(self, batch_size: int, steps_per_epoch: int = 100,
                 size: int = 112, channels: int = 3, num_classes: int = 1000,
                 seed: int = 0, shard_id: int = 0, num_shards: int = 1,
                 uint8: bool = False):
        self.batch_size = batch_size  # per-process batch
        self.steps_per_epoch = steps_per_epoch
        self.size, self.channels = size, channels
        self.num_classes = num_classes
        self.seed = seed
        self.shard_id, self.num_shards = shard_id, num_shards
        self.uint8 = uint8

    def __len__(self):
        return self.steps_per_epoch * self.batch_size * self.num_shards

    def epoch(self, epoch: int):
        for i in range(self.steps_per_epoch):
            # distinct per-shard stream (each process draws its own slice)
            yield synthetic_batch(
                self.batch_size, self.size, self.channels, self.num_classes,
                uint8=self.uint8,
                seed=(self.seed + epoch * 100003 + i) * self.num_shards
                + self.shard_id)
