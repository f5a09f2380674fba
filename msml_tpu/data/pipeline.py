"""Host->device input pipeline with background prefetch.

The TPU-native replacement for `DataLoaderX`'s background-thread generator +
CUDA-stream H2D prefetch (`datasets/dataloaderx.py:12-67`): a worker thread
prepares and `jax.device_put`s batches with the right sharding while the
device computes, keeping N batches in flight (double buffering by default).

The generator is safe to abandon early (e.g. a `break` out of the training
loop): closing it stops the worker thread and closes the inner iterator, so
dataset resources (worker pools) are released.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msml_tpu.core.mesh import DATA_AXIS, batch_sharding

_SENTINEL = object()


def _stack_windows(it: Iterator, n: int) -> Iterator:
    """Group n consecutive batches into one stacked pytree (leading dim n)
    for the scanned multi-step train update; a trailing partial window is
    dropped (same drop_last semantics as the epoch batching) with a log
    line so the loss of those steps is visible."""
    import logging

    import numpy as np
    try:
        buf = []
        for b in it:
            buf.append(b)
            if len(buf) == n:
                yield jax.tree.map(lambda *xs: np.stack(xs), *buf)
                buf = []
        if buf:
            logging.getLogger("msml_tpu").info(
                "dropping trailing partial scan window (%d of %d batches)",
                len(buf), n)
    finally:
        # propagate close() through the wrapper so abandoning the
        # prefetcher still releases the dataset's worker pool
        if hasattr(it, "close"):
            try:
                it.close()
            except Exception:
                pass


def device_prefetch(it: Iterator, mesh: Mesh, depth: int = 2,
                    scan_steps: int = 1):
    """Yield batches already transferred and sharded over the data axis.

    Single-host: the iterator yields global batches, device_put with the
    sharding splits them across local chips. Multi-host (process_count > 1):
    each process's iterator yields its PROCESS-LOCAL batch (the
    DistributedSampler-per-rank analogue, reference train.py:94-95) and the
    global array is assembled with jax.make_array_from_process_local_data —
    a host can only address its own devices, so a host-built global array
    cannot be device_put across the pod.

    scan_steps > 1 stacks that many batches per yield (leading dim =
    scan_steps, batch dim second) for make_train_step(scan_steps=n)."""
    if scan_steps > 1:
        it = _stack_windows(it, scan_steps)
        from msml_tpu.core.mesh import batch_axes
        sharding = NamedSharding(mesh, P(None, batch_axes(mesh)))
    else:
        sharding = batch_sharding(mesh)
    multihost = jax.process_count() > 1

    def put(batch):
        if multihost:
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(sharding, x),
                batch)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    err: list = []
    # Bound now because the generator's finally-block can run from the GC
    # finalizer at interpreter shutdown, after module globals (the `queue`
    # module ref) have been torn down.
    empty_exc = queue.Empty

    def _enqueue(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in it:
                if not _enqueue(put(batch)):
                    break
        except Exception as e:  # surface loader errors on the main thread
            err.append(e)
        finally:
            if hasattr(it, "close"):
                try:
                    it.close()
                except Exception:
                    pass
            _enqueue(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        # drain so a blocked worker can observe stop and exit
        try:
            while True:
                q.get_nowait()
        except empty_exc:
            pass
