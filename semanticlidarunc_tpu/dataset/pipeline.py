"""Host data pipeline: shuffling, batching, background prefetch.

Replaces the reference's torch DataLoader worker processes
(/root/reference/src/train_semantics.py:111-127) with a thread-pool loader:
numpy projection/normals release the GIL inside BLAS/cv2, and each batch is
assembled into pinned host arrays ready for a single `jax.device_put`.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


def collate(samples: list[dict]) -> dict:
    return {k: np.stack([s[k] for s in samples], axis=0) for k in samples[0]}


class DataLoader:
    """Minimal epoch-based loader: shuffle, map via workers, prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 0, prefetch: int = 4, seed: int = 0,
                 drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.num_workers = int(num_workers)
        self.prefetch = max(1, int(prefetch))
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i:i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def __iter__(self) -> Iterator[dict]:
        if self.num_workers <= 0:
            for chunk in self._index_batches():
                yield collate([self.dataset[int(j)] for j in chunk])
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                try:
                    for chunk in self._index_batches():
                        if stop.is_set():
                            return
                        samples = list(pool.map(
                            lambda j: self.dataset[int(j)], chunk))
                        q.put(collate(samples))
                finally:
                    q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


class SyntheticDataset:
    """In-memory synthetic dataset producing reader-compatible samples,
    used by tests, smoke configs, and benchmarks (no data on disk needed)."""

    def __init__(self, n_scans: int = 8, projection=(32, 128), seed: int = 0,
                 n_beams: int = 64, n_azimuth: int = 512):
        from ..ops.projection import spherical_projection_np
        from .readers import _build_normals
        from .synthetic import make_scan

        self.samples = []
        for i in range(n_scans):
            pc = make_scan(seed=seed + i, n_beams=n_beams, n_azimuth=n_azimuth)
            img, _, _, _ = spherical_projection_np(pc, projection[0],
                                                   projection[1])
            labels = img[..., 4].astype(np.int64)
            xyz = img[..., 0:3].astype(np.float32)
            self.samples.append({
                "range": np.linalg.norm(xyz, axis=-1, keepdims=True),
                "reflectivity": img[..., 3:4].astype(np.float32),
                "xyz": xyz,
                "normals": _build_normals(xyz).astype(np.float32),
                "labels": labels,
            })

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]
