"""Batched data loading with prefetch.

Replaces the reference's detectron2 ``build_detection_train_loader`` +
torch DataLoader worker processes (reference tools/train_net.py:89-97,
DATALOADER.NUM_WORKERS) with a thread-pool prefetching loader: the mapper
work (PNG decode, cv2 resize, target generation) releases the GIL, and the
assembled fixed-shape numpy batches feed ``jax.device_put`` with the batch
dimension sharded over the mesh's data axis.

Also provides the ImageList equivalent: padding each sample to a common
size divisible by MODEL.SIZE_DIVISIBILITY (reference mg_net.py:251).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

__all__ = ["pad_to_divisible", "collate_batch", "TrainLoader", "test_loader"]

_PAD_VALUES = {
    "sem_seg": 255,  # ignore label — padded pixels produce no loss
}


def pad_to_divisible(arr: np.ndarray, divisibility: int,
                     pad_value: float = 0.0,
                     target_hw: Optional[tuple] = None) -> np.ndarray:
    """Pad H, W (leading two dims) up to a multiple of ``divisibility``."""
    h, w = arr.shape[:2]
    if target_hw is not None:
        th, tw = target_hw
    else:
        th, tw = h, w
    d = divisibility
    th = -(-th // d) * d
    tw = -(-tw // d) * d
    if (h, w) == (th, tw):
        return arr
    pads = [(0, th - h), (0, tw - w)] + [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, pads, mode="constant", constant_values=pad_value)


def collate_batch(samples: List[Dict], divisibility: int = 32) -> Dict:
    """Stack per-sample dicts into batched arrays, padding spatial dims."""
    spatial_keys = [
        k for k, v in samples[0].items()
        if isinstance(v, np.ndarray) and v.ndim >= 2
        and k not in ("camera_matrix",)
    ]
    max_h = max(s[spatial_keys[0]].shape[0] for s in samples)
    max_w = max(s[spatial_keys[0]].shape[1] for s in samples)
    out: Dict[str, np.ndarray] = {}
    for k, v0 in samples[0].items():
        if k in spatial_keys:
            out[k] = np.stack([
                pad_to_divisible(
                    s[k], divisibility, _PAD_VALUES.get(k, 0),
                    target_hw=(max_h, max_w),
                )
                for s in samples
            ])
        elif isinstance(v0, np.ndarray) or np.isscalar(v0) or isinstance(
            v0, (int, float, np.floating, np.integer)
        ):
            out[k] = np.stack([np.asarray(s[k]) for s in samples])
        else:
            out[k] = [s[k] for s in samples]  # strings / metadata
    return out


class TrainLoader:
    """Infinite shuffled loader with threaded prefetch.

    Deterministic: worker i of epoch e maps sample j with an rng seeded
    from (seed, e, j) — re-running with the same seed reproduces batches
    (SURVEY.md §5 determinism).

    Multi-process: with ``process_count > 1``, ``batch_size`` is the
    GLOBAL batch; every process derives the same global sample stream
    (identical seed) and maps ONLY its contiguous per-process slice of
    each global batch, yielding local batches of
    ``batch_size / process_count`` samples for
    ``parallel.shard_batch`` to assemble into the global array — the
    reference's per-rank sampler-shard semantics
    (detectron2 build_detection_train_loader under DDP,
    reference tools/train_net.py:89-97,241-248) without duplicate
    mapper work. Note: local batches on different processes must collate
    to identical spatial shapes (guaranteed with fixed-size crops, the
    flagship config); global assembly fails loudly otherwise.
    """

    def __init__(
        self,
        dataset: Sequence[Dict],
        mapper: Callable,
        batch_size: int,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 4,
        divisibility: int = 32,
        drop_keys: Sequence[str] = ("image_id",),
        process_index: int = 0,
        process_count: int = 1,
    ):
        assert batch_size % max(1, process_count) == 0, (
            f"global batch {batch_size} must divide over "
            f"{process_count} processes"
        )
        self.dataset = list(dataset)
        self.mapper = mapper
        self.batch_size = batch_size
        self.local_batch = batch_size // max(1, process_count)
        self.process_index = process_index
        self.process_count = max(1, process_count)
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.divisibility = divisibility
        self.drop_keys = set(drop_keys)
        self._stop = threading.Event()
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._thread: Optional[threading.Thread] = None

    def _sample_indices(self) -> Iterator[tuple]:
        rng = np.random.default_rng(self.seed)
        epoch = 0
        while True:
            order = rng.permutation(len(self.dataset))
            for j in order:
                yield epoch, int(j)
            epoch += 1

    def _local_indices(self) -> Iterator[tuple]:
        """This process's slice of each global batch (identical global
        stream on every process; slicing is a no-op single-process)."""
        it = self._sample_indices()
        lo = self.process_index * self.local_batch
        hi = lo + self.local_batch
        while True:
            group = [next(it) for _ in range(self.batch_size)]
            yield from group[lo:hi]

    def _producer(self):
        idx_iter = self._local_indices()
        with ThreadPoolExecutor(self.num_workers) as pool:
            def map_one(args):
                epoch, j = args
                rng = np.random.default_rng(
                    (self.seed, epoch, j)
                )
                s = self.mapper(self.dataset[j], rng=rng)
                for k in self.drop_keys:
                    s.pop(k, None)
                return s

            pending = []
            while not self._stop.is_set():
                while len(pending) < self.local_batch * 2:
                    pending.append(pool.submit(map_one, next(idx_iter)))
                samples = [f.result() for f in pending[: self.local_batch]]
                pending = pending[self.local_batch:]
                batch = collate_batch(samples, self.divisibility)
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue

    def __iter__(self):
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._producer, daemon=True
            )
            self._thread.start()
        while True:
            yield self._queue.get()

    def close(self):
        self._stop.set()


def test_loader(dataset: Sequence[Dict], mapper: Callable,
                num_workers: int = 4) -> Iterator[Dict]:
    """Ordered single-sample evaluation iterator with prefetch."""
    with ThreadPoolExecutor(num_workers) as pool:
        for sample in pool.map(mapper, dataset):
            yield sample
