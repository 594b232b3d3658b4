"""Host data loader: threaded decode + double-buffered device prefetch.

The reference relies on torch ``DataLoader(num_workers=4, pin_memory=True)``
(ref: train_aug_monuseg.py:200-212, train_herlev.py:575-581).  The
TPU-native equivalent here:

* a thread pool runs ``dataset[i]`` decodes concurrently (PIL/XML work
  releases the GIL in zlib/libtiff),
* batches are collated into pinned numpy arrays,
* ``prefetch_to_device`` keeps N batches ahead of the consumer in HBM
  (``jax.device_put`` on a background thread) — the double-buffering
  BASELINE.json asks for, so the accelerator never waits on the host.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import jax
import numpy as np

__all__ = ["DataLoader", "prefetch_to_device"]


def _collate(samples: Sequence) -> tuple[np.ndarray, ...]:
    first = samples[0]
    out = []
    for i in range(len(first)):
        parts = [s[i] for s in samples]
        if np.isscalar(parts[0]) or np.asarray(parts[0]).ndim == 0:
            out.append(np.asarray(parts))
        else:
            out.append(np.stack(parts))
    return tuple(out)


class DataLoader:
    """Minimal threaded batch loader over a map-style dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int = 8,
        shuffle: bool = False,
        num_workers: int = 4,
        drop_last: bool = False,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[tuple[np.ndarray, ...]]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(idx)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        batches = [
            idx[s : s + self.batch_size] for s in range(0, end, self.batch_size)
        ]
        if not batches:
            return
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # pipeline: submit decode jobs for batch k+1 while yielding k
            def fetch(batch_idx):
                samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                return _collate(samples)

            pending = pool.submit(fetch, batches[0])
            for nxt in batches[1:]:
                ready = pending.result()
                pending = pool.submit(fetch, nxt)
                yield ready
            yield pending.result()


def prefetch_to_device(iterator, size: int = 2, device=None, put=None):
    """Wrap a host batch iterator with an N-deep device prefetch queue.

    A daemon thread pushes ``jax.device_put`` batches into a bounded queue;
    the consumer always finds the next batch already resident in HBM
    (double-buffered host->HBM copy overlapping compute).  ``put`` overrides
    the transfer (e.g. a mesh-sharding ``_as_batch``); default is
    ``jax.device_put(batch, device)``.
    """
    if put is None:
        def put(batch):
            return jax.device_put(batch, device)

    q: queue.Queue = queue.Queue(maxsize=size)
    _SENTINEL = object()

    class _PrefetchError:
        def __init__(self, exc):
            self.exc = exc

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
        except BaseException as exc:  # propagate: a swallowed transfer/shard
            q.put(_PrefetchError(exc))  # error would silently truncate the
            return                      # consumer's epoch
        q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        if isinstance(item, _PrefetchError):
            raise item.exc
        yield item
