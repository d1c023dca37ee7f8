"""Dataset protocol and a threaded, prefetching batch loader.

Replaces torch DataLoader (reference: enhancing/dataloader/__init__.py:43-53)
with a host-side pipeline tuned for feeding a TPU: worker threads decode and
transform samples (PIL/numpy release the GIL for the heavy parts), batches are
assembled as stacked numpy arrays, and an optional device-prefetch stage
overlaps host->HBM transfer with compute.
"""
from __future__ import annotations

import queue
import random
import threading
from typing import Any, Dict, Iterator, List, Optional


class Dataset:
    """Minimal map-style dataset protocol: __len__ + __getitem__ -> dict."""

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        raise NotImplementedError


def _stack(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    import numpy as np
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], str):
            out[key] = vals
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


class DataLoader:
    """Threaded batch loader with shuffling and bounded prefetch.

    Multi-host: pass ``shard_id``/``num_shards`` (defaults to
    jax.process_index()/process_count() when ``auto_shard``) — each host
    loads a disjoint slice of every epoch's permutation, the standard
    per-process sharding for GSPMD data parallelism (the reference's
    DistributedSampler equivalent, which Lightning injected implicitly).
    """

    def __init__(self, dataset: Dataset, batch_size: int,
                 shuffle: bool = False, num_workers: int = 4,
                 drop_last: bool = True, seed: int = 0,
                 prefetch: int = 4, shard_id: Optional[int] = None,
                 num_shards: Optional[int] = None,
                 auto_shard: bool = True) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0
        if shard_id is None and auto_shard:
            try:
                import jax
                shard_id = jax.process_index()
                num_shards = jax.process_count()
            except Exception:
                shard_id, num_shards = 0, 1
        self.shard_id = shard_id or 0
        self.num_shards = num_shards or 1

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self) -> List[List[int]]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            # same permutation on every host (seeded), disjoint strided shards
            random.Random(self.seed + self._epoch).shuffle(idx)
        if self.num_shards > 1:
            idx = idx[self.shard_id::self.num_shards]
        bs = self.batch_size
        batches = [idx[i:i + bs] for i in range(0, len(idx), bs)]
        if self.drop_last and batches and len(batches[-1]) < bs:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        batches = self._batches()
        self._epoch += 1
        if not batches:
            return iter(())

        work: "queue.Queue" = queue.Queue()
        done: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        for i, b in enumerate(batches):
            work.put((i, b))
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    i, b = work.get_nowait()
                except queue.Empty:
                    return
                try:
                    # datasets may provide a whole-batch fast path (e.g. the
                    # native C++ decode->resize->crop pipeline in
                    # classimage.py); fall back to per-sample assembly
                    if hasattr(self.dataset, "get_batch"):
                        done.put((i, self.dataset.get_batch(b)))
                    else:
                        samples = [self.dataset[j] for j in b]
                        done.put((i, _stack(samples)))
                except Exception as e:  # surface in the consumer
                    done.put((i, e))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        def gen():
            # re-order: emit batches in submission order
            pending: Dict[int, Any] = {}
            nxt = 0
            try:
                while nxt < len(batches):
                    while nxt not in pending:
                        i, item = done.get()
                        pending[i] = item
                    item = pending.pop(nxt)
                    nxt += 1
                    if isinstance(item, Exception):
                        raise item
                    yield item
            finally:
                stop.set()

        return gen()


class DataModuleFromConfig:
    """Config-built train/val/test loaders
    (reference: enhancing/dataloader/__init__.py:14-53)."""

    def __init__(self, batch_size: int, train: Optional[dict] = None,
                 validation: Optional[dict] = None,
                 test: Optional[dict] = None,
                 num_workers: Optional[int] = None) -> None:
        from ..utils.config import initialize_from_config
        self._init = initialize_from_config
        self.batch_size = batch_size
        self.num_workers = num_workers if num_workers is not None \
            else batch_size * 2
        self.dataset_configs = {}
        if train is not None:
            self.dataset_configs["train"] = train
        if validation is not None:
            self.dataset_configs["validation"] = validation
        if test is not None:
            self.dataset_configs["test"] = test
        self.datasets: Dict[str, Dataset] = {}

    def prepare_data(self) -> None:
        for cfg in self.dataset_configs.values():
            self._init(cfg)

    def setup(self, stage: Optional[str] = None) -> None:
        self.datasets = {k: self._init(cfg)
                         for k, cfg in self.dataset_configs.items()}

    def _loader(self, split: str, shuffle: bool) -> DataLoader:
        if split not in self.datasets:
            self.setup()
        return DataLoader(self.datasets[split], self.batch_size,
                          shuffle=shuffle, num_workers=self.num_workers,
                          drop_last=shuffle)

    def train_dataloader(self) -> DataLoader:
        return self._loader("train", True)

    def val_dataloader(self) -> DataLoader:
        return self._loader("validation", False)

    def test_dataloader(self) -> DataLoader:
        return self._loader("test", False)
