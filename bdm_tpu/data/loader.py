"""Batch loader: shuffling, collation into arrays, background prefetch.

Replaces torch DataLoader + `custom_collate` (`shapenet_r2n2.py:601-612`).
Cameras collate by stacking their array fields (they are pytrees), not into
Python lists — fixed-shape batches are a requirement for jit/scan/sharding.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Sequence

import jax.numpy as jnp
import numpy as np

from bdm_tpu.conditioning.cameras import PerspectiveCamera


def collate(samples: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a list of sample dicts into one batch dict of arrays."""
    out: Dict[str, Any] = {}
    for key in samples[0].keys():
        v0 = samples[0][key]
        if v0 is None:
            out[key] = None
        elif isinstance(v0, PerspectiveCamera):
            out[key] = PerspectiveCamera(
                R=jnp.concatenate([s[key].R for s in samples], axis=0),
                T=jnp.concatenate([s[key].T for s in samples], axis=0),
                focal_length=jnp.concatenate(
                    [s[key].focal_length for s in samples], axis=0),
                principal_point=jnp.concatenate(
                    [s[key].principal_point for s in samples], axis=0),
            )
        elif isinstance(v0, (np.ndarray, jnp.ndarray)):
            out[key] = jnp.stack([jnp.asarray(s[key]) for s in samples])
        elif isinstance(v0, (int, float)):
            out[key] = jnp.asarray([s[key] for s in samples])
        else:  # strings/metadata stay as lists
            out[key] = [s[key] for s in samples]
    return out


MODEL_BATCH_KEYS = ("points", "colors", "image", "mask",
                    "distance_transform", "camera")


def model_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Strip metadata (paths, names) so only array leaves reach jit/shard."""
    return {k: batch[k] for k in MODEL_BATCH_KEYS
            if k in batch and batch[k] is not None}


class DataLoader:
    """Minimal epoch-based loader with optional background prefetching."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_workers: int = 0, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch if num_workers > 0 else 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        end = (len(idx) // self.batch_size * self.batch_size
               if self.drop_last else len(idx))
        for i in range(0, end, self.batch_size):
            yield idx[i:i + self.batch_size]

    def _make_batch(self, indices) -> Dict[str, Any]:
        return collate([self.dataset[int(i)] for i in indices])

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.prefetch <= 0:
            for indices in self._batch_indices():
                yield self._make_batch(indices)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for indices in self._batch_indices():
                    q.put(self._make_batch(indices))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item

    def infinite(self) -> Iterator[Dict[str, Any]]:
        """Endless epochs (the reference trains with a `while True` epoch
        loop, `main.py:183`)."""
        while True:
            yield from self
