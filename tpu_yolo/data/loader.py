"""Multi-threaded prefetching data loader (torch-free).

Replaces the reference's torch.utils.data.DataLoader with 8 worker
processes (main.py:72-73). OpenCV decode/warp releases the GIL, so a
thread pool saturates the host cores without multiprocessing overhead;
batches are prefetched into a bounded queue so host preprocessing
overlaps device steps (double buffering of the H2D stream happens in
the caller via jax.device_put on the next batch while the current one
computes).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from tpu_yolo.data.dataset import collate


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 8, drop_last: bool = False,
                 prefetch: int = 4, seed: int = 0, sampler=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_workers = num_workers
        self.seed = seed
        self.epoch = 0
        self.sampler = sampler  # optional per-host shard sampler

    def set_epoch(self, epoch: int):
        """Reshuffle seed per epoch (reference DistributedSampler.set_epoch,
        main.py:107-108)."""
        self.epoch = epoch

    def _indices(self):
        if self.sampler is not None:
            return list(self.sampler.indices(self.epoch))
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx.tolist()

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        indices = self._indices()
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(max(self.num_workers, 1)) as pool:
                try:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                        q.put(collate(samples))
                finally:
                    q.put(None)

        worker = threading.Thread(target=produce, daemon=True)
        worker.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while worker.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


class ShardSampler:
    """Deterministic per-host shard of the index space for multi-host data
    parallelism (reference DistributedSampler, main.py:69-70). Each host
    sees an equal-size, padded shard; reshuffled by epoch."""

    def __init__(self, n: int, num_shards: int, shard: int, shuffle: bool = True,
                 seed: int = 0):
        self.n = n
        self.num_shards = num_shards
        self.shard = shard
        self.shuffle = shuffle
        self.seed = seed

    def indices(self, epoch: int):
        idx = np.arange(self.n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            rng.shuffle(idx)
        per = -(-self.n // self.num_shards)
        padded = np.concatenate([idx, idx[: per * self.num_shards - self.n]])
        return padded[self.shard::self.num_shards]


def make_val_loader(dataset, batch_size: int, num_workers: int = 8,
                    native: str = "auto"):
    """Eval loader factory (reference eval DataLoader, main.py:232-234).

    Prefers the native C++ pipeline (native_loader.NativeEvalLoader —
    identical image/label geometry, decode+letterbox in the GIL-free
    C++ pool) when the .so is available: on a multi-core host its
    decode scales at ~415 GIL-free decodes/s/core while the eval
    loop's own host work (TP matching, AP) is GIL-bound python that
    cv2 worker threads would contend with. Measured on the 1-core
    tunnel box the two loaders are at parity and the e2e eval wall is
    elsewhere (BENCH.md "eval loader A/B"); contract equality is
    pinned per-batch, so switching is free. `native`: "auto" (use it
    if present), "on" (require it), "off" (Python loader — the parity
    oracle path).
    """
    if native not in ("auto", "on", "off"):
        raise ValueError(f"native must be auto|on|off, got {native!r}")
    if native != "off":
        from tpu_yolo.data import native_loader as nl
        if nl.available():
            return nl.NativeEvalLoader(dataset, batch_size,
                                       threads=max(num_workers, 1))
        if native == "on":
            raise RuntimeError(
                "native eval loader requested (--native-eval on) but "
                "native/libtpuyolo_data.so is unavailable; run "
                "`make -C native`")
    return DataLoader(dataset, batch_size, shuffle=False,
                      num_workers=num_workers)
