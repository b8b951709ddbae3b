"""Batch assembly + prefetching loader.

``AlignCollate`` semantics (``ocr/tools/dataset.py:68-101``): keep_ratio
mode resizes each crop to height 32 preserving aspect (width capped at
100) then right-pads by replicating the last column — the reference's
``NormalizePad`` wrote the image into the padding slice instead
(``dataset.py:62-64``); fixed here.  Non-keep_ratio mode is a plain
bicubic ResizeNormalize.

The loader itself is a thread-prefetched iterator over the record
dataset — the TPU replacement for torch DataLoader worker processes:
decode/augment on host threads, one pinned numpy batch handed to
``jax.device_put`` at a time.
"""
from __future__ import annotations

import math
import queue
import threading
from typing import Iterator

import numpy as np


def resize_normalize_pil(img, width: int, height: int) -> np.ndarray:
    """PIL bicubic resize -> [-1, 1] float32 [H, W] (``dataset.py:37-47``)."""
    from PIL import Image

    img = img.resize((width, height), Image.BICUBIC)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return (arr - 0.5) / 0.5


def align_collate(
    samples: list,
    height: int = 32,
    width: int = 100,
    keep_ratio: bool = False,
) -> tuple[np.ndarray, list[str]]:
    """[(PIL, label)] -> (images [B, H, W, 1] in [-1,1], labels)."""
    from PIL import Image

    images, labels = zip(*samples)
    out = np.zeros((len(images), height, width), np.float32)
    if keep_ratio:
        for i, img in enumerate(images):
            w, h = img.size
            ratio = w / max(h, 1)
            resized_w = min(math.ceil(height * ratio), width)
            resized_w = max(resized_w, 1)
            arr = resize_normalize_pil(img, resized_w, height)
            out[i, :, :resized_w] = arr
            if resized_w < width:  # edge-replicate pad (fixed NormalizePad)
                out[i, :, resized_w:] = arr[:, -1:]
    else:
        for i, img in enumerate(images):
            out[i] = resize_normalize_pil(img, width, height)
    return out[..., None], list(labels)


class AlignCollate:
    """Callable-class form of :func:`align_collate` (reference API,
    ``dataset.py:68-101``)."""

    def __init__(self, height: int = 32, width: int = 100,
                 keep_ratio: bool = False):
        self.height, self.width, self.keep_ratio = height, width, keep_ratio

    def __call__(self, batch):
        batch = [b for b in batch if b is not None]
        return align_collate(batch, self.height, self.width, self.keep_ratio)


class RandomSequentialSampler:
    """Random-start contiguous batches (``dataset.py:104-125`` intent)."""

    def __init__(self, n: int, batch_size: int, seed: int = 0):
        self.n = n
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[np.ndarray]:
        n_batches = self.n // self.batch_size
        for _ in range(n_batches):
            start = int(self.rng.integers(0, max(self.n - self.batch_size, 0) + 1))
            yield np.arange(start, start + self.batch_size)


class ShuffleSampler:
    def __init__(self, n: int, batch_size: int, seed: int = 0,
                 drop_last: bool = True):
        self.n, self.batch_size = n, batch_size
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def __iter__(self) -> Iterator[np.ndarray]:
        perm = self.rng.permutation(self.n)
        end = self.n - (self.n % self.batch_size) if self.drop_last else self.n
        for i in range(0, end, self.batch_size):
            yield perm[i : i + self.batch_size]


class DataLoader:
    """Thread-prefetched batches of (images, labels)."""

    def __init__(
        self,
        dataset,
        batch_size: int = 64,
        height: int = 32,
        width: int = 100,
        keep_ratio: bool = False,
        shuffle: bool = True,
        random_sample: bool = True,
        seed: int = 0,
        prefetch: int = 4,
        workers: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.height, self.width = height, width
        self.keep_ratio = keep_ratio
        if shuffle or random_sample:
            self.sampler = ShuffleSampler(len(dataset), batch_size, seed)
        else:
            self.sampler = RandomSequentialSampler(len(dataset), batch_size, seed)
        self.prefetch = prefetch
        self.workers = workers

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def _load_batch(self, idx: np.ndarray):
        samples = [self.dataset[int(i)] for i in idx]
        return align_collate(
            samples, self.height, self.width, self.keep_ratio
        )

    def __iter__(self):
        batches = list(self.sampler)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        index_q: "queue.Queue" = queue.Queue()
        for bi, idx in enumerate(batches):
            index_q.put((bi, idx))
        results: dict[int, object] = {}
        results_lock = threading.Condition()

        def worker():
            while not stop.is_set():
                try:
                    bi, idx = index_q.get_nowait()
                except queue.Empty:
                    return
                batch = self._load_batch(idx)
                with results_lock:
                    results[bi] = batch
                    results_lock.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(max(1, self.workers))
        ]
        for t in threads:
            t.start()
        try:
            for bi in range(len(batches)):
                with results_lock:
                    while bi not in results:
                        results_lock.wait(timeout=60.0)
                    yield results.pop(bi)
        finally:
            stop.set()
