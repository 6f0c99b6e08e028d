"""Host -> device batch pipeline.

The reference blocks training on synchronous host work: per batch it gathers
patches in Python, then feeds a ``sess.run`` (PW_AL.py:1060-1088 — hot loop
3 of SURVEY.md §3).  This loader overlaps the two: a background thread runs
the native C++ patch gather (runtime/patch_gather.cc) and stages
``jax.device_put`` transfers into a bounded queue while the device trains on
the previous batch — classic double buffering across the PCIe/host seam.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np

from nnal_tpu.data.batching import make_onehot
from nnal_tpu.runtime.native import gather_labels_native, gather_patches_native


class PrefetchLoader:
    """Wrap a host-batch iterator with an N-deep device prefetch queue."""

    def __init__(self, host_batches: Iterator, depth: int = 2,
                 device=None):
        self._it = host_batches
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._device = device or jax.devices()[0]
        self._done = object()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._it:
                staged = jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, self._device), batch)
                self._q.put(staged)
        except BaseException as e:  # surfaced on next()
            self._err = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def patch_batch_source(padded_vols, mask, train_inds, patch_shape,
                       orig_shape, mu, sd, batch_size: int, nclass: int,
                       rng, epochs: int = 1) -> Iterator:
    """Host batch generator over labeled voxels using the native gather.

    ``padded_vols``: list of m host (padded) volumes.  Yields ``(x, y)``
    NumPy pairs ready for device_put.
    """
    from nnal_tpu.data.batching import gen_batch_inds

    labels = gather_labels_native(np.asarray(mask, np.float32),
                                  np.asarray(train_inds, np.int64))
    for _ in range(epochs):
        for batch in gen_batch_inds(len(train_inds), batch_size, rng):
            binds = np.asarray(train_inds)[batch]
            x = gather_patches_native(padded_vols, binds, patch_shape,
                                      orig_shape, mu, sd)
            y = make_onehot(labels[batch].astype(np.int64), nclass)
            yield x, y


def prefetched_patch_batches(padded_vols, mask, train_inds, patch_shape,
                             orig_shape, mu, sd, batch_size: int,
                             nclass: int, rng, epochs: int = 1,
                             depth: int = 2) -> PrefetchLoader:
    return PrefetchLoader(
        patch_batch_source(padded_vols, mask, train_inds, patch_shape,
                           orig_shape, mu, sd, batch_size, nclass, rng,
                           epochs),
        depth=depth)
