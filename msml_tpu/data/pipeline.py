"""Host->device input pipeline with background prefetch.

The TPU-native replacement for `DataLoaderX`'s background-thread generator +
CUDA-stream H2D prefetch (`datasets/dataloaderx.py:12-67`): a worker thread
prepares and `jax.device_put`s batches with the right sharding while the
device computes, keeping N batches in flight (double buffering by default).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msml_tpu.core.mesh import DATA_AXIS


def device_prefetch(it: Iterator, mesh: Mesh, depth: int = 2):
    """Yield batches already transferred and sharded over the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def put(batch):
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []

    def worker():
        try:
            for batch in it:
                q.put(put(batch))
        except Exception as e:  # surface loader errors on the main thread
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
