"""Host→device input pipeline with background prefetch.

The reference's input path is synchronous per-batch host work
(torch DataLoader workers feeding one GPU).  Here a background thread
stages the next batches onto device (with the batch dim sharded over
the mesh's data axis) while the current step runs — keeping the TPU fed
without blocking the train loop on host tokenisation/decode.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax

from ..core.mesh import shard_batch


class _End:
    pass


def prefetch_to_device(batches: Iterable[dict], mesh=None,
                       buffer_size: int = 2) -> Iterator[dict]:
    """Iterate ``batches``, staging up to ``buffer_size`` batches on
    device ahead of consumption.  With a mesh, batches are sharded over
    the data axis; otherwise committed to the default device."""
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    err: list[BaseException] = []

    def producer():
        try:
            for batch in batches:
                if mesh is not None:
                    staged = shard_batch(mesh, batch)
                else:
                    staged = {k: jax.device_put(v)
                              for k, v in batch.items()}
                q.put(staged)
        except BaseException as e:  # noqa: BLE001 - re-raised in consumer
            err.append(e)
        finally:
            q.put(_End)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _End:
            break
        yield item
    thread.join()
    if err:
        raise err[0]
