"""Dataset registry + batching loader with host prefetch.

Capability of /root/reference/data/__init__.py:18-98 (name->class registry,
shuffling loader, drop_last in train, ``max_dataset_size`` cap, set_epoch),
rebuilt for a single-controller JAX host: a thread pool decodes PIL images
concurrently, batches are stacked into pinned numpy NHWC arrays, and
``prefetch_to_device`` keeps a double buffer of device-resident batches so
the jitted train step never waits on the host (the TPU analog of
DataLoader worker processes; reference num_threads flag).
"""

from __future__ import annotations

import importlib
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


def find_dataset_using_name(name: str):
    module = importlib.import_module(f"dfmir_tpu.data.{name}")
    target = name.replace("_", "") + "dataset"
    for attr in dir(module):
        if attr.lower() == target and isinstance(getattr(module, attr), type):
            return getattr(module, attr)
    raise ImportError(
        f"dfmir_tpu.data.{name} has no class matching {target!r}")


def get_option_setter(name: str):
    return find_dataset_using_name(name).modify_commandline_options


def create_dataset(opt) -> "DataLoader":
    dataset_cls = find_dataset_using_name(opt.dataset_mode)
    return DataLoader(dataset_cls(opt), opt)


def _stack(samples):
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Iterable over dict batches {'A': (B,H,W,C) f32, 'B': ..., paths}."""

    def __init__(self, dataset, opt):
        if len(dataset) == 0:
            raise RuntimeError(
                f"Found 0 samples under {opt.dataroot} for dataset_mode="
                f"{opt.dataset_mode!r} (phase {opt.phase!r})")
        self.dataset = dataset
        self.opt = opt
        self.batch_size = opt.batch_size
        self.shuffle = not opt.serial_batches
        self.drop_last = bool(getattr(opt, "isTrain", False))
        self.num_threads = max(int(getattr(opt, "num_threads", 0)), 0)
        self.max_dataset_size = getattr(opt, "max_dataset_size", float("inf"))
        self.seed = int(getattr(opt, "seed", 0) or 0)
        self._epoch = 0

    # reference API compat (data/__init__.py:60-63)
    def load_data(self) -> "DataLoader":
        return self

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = min(len(self.dataset), self.max_dataset_size)
        if self.drop_last:
            return int(n // self.batch_size) * self.batch_size
        return int(n)

    def _indices(self):
        n = int(min(len(self.dataset), self.max_dataset_size))
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, self._epoch)).shuffle(idx)
        if self.drop_last:
            idx = idx[: (n // self.batch_size) * self.batch_size]
        return idx

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.num_threads <= 0:
            for b in batches:
                yield _stack([self.dataset[int(i)] for i in b])
            return
        with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            # pipeline: submit up to 2 batches ahead
            pending = []
            it = iter(batches)
            def submit_next():
                b = next(it, None)
                if b is not None:
                    pending.append([pool.submit(self.dataset.__getitem__,
                                                int(i)) for i in b])
            for _ in range(3):
                submit_next()
            while pending:
                futs = pending.pop(0)
                batch = _stack([f.result() for f in futs])
                submit_next()
                yield batch


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Wrap a host batch iterator, moving arrays to device ``size`` batches
    ahead on a background thread (double-buffered HBM feed)."""
    import jax

    def to_device(batch):
        return {
            k: (jax.device_put(v, sharding) if isinstance(v, np.ndarray)
                else v)
            for k, v in batch.items()
        }

    q: "queue.Queue" = queue.Queue(maxsize=size)
    END = object()

    def producer():
        try:
            for batch in iterator:
                q.put(to_device(batch))
        finally:
            q.put(END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is END:
            return
        yield item
