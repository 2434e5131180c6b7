"""Store-backed training batcher using the native C++ loader.

Drop-in alternative to the in-memory :class:`train.data.GraphBatcher` that
streams padded batches straight from ``.b3d`` scene stores: window sizes are
indexed once, windows are bucketed/shuffled, and each batch is assembled by
the multithreaded C++ ``b3d_fill_padded_batch`` (zero-copy mmap reads +
memcpy into fixed-shape buffers). Falls back to the numpy reader when the
native library cannot build.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from batch3dmot_tpu.graph import DEFAULT_BUCKETS, PaddedGraph, pick_bucket
from batch3dmot_tpu.io.native import (
    NativeGraphStore,
    batch_to_padded_graph,
    native_available,
)
from batch3dmot_tpu.io.store import GraphStoreReader
from batch3dmot_tpu.train.data import GraphBatcher


class StoreGraphBatcher:
    """Batches windows from many scene stores via the native loader."""

    def __init__(
        self,
        store_paths: Sequence[str],
        batch_size: int,
        buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
        seed: int = 0,
        num_threads: int = 4,
        uniform: bool = False,
    ):
        if not native_available():
            raise RuntimeError(
                "native graphstore unavailable; use GraphBatcher with "
                "io.store.load_scene_graphs instead"
            )
        self.batch_size = batch_size
        self.num_threads = num_threads
        self._rng = np.random.default_rng(seed)
        self._stores = [NativeGraphStore(p) for p in store_paths]
        sizes = []
        for store in self._stores:
            nodes, edges = store.window_sizes()
            sizes.append((nodes, edges))
        if uniform:
            from batch3dmot_tpu.train.data import uniform_bucket

            buckets = uniform_bucket(
                [
                    (int(n), int(e))
                    for nodes, edges in sizes
                    for n, e in zip(nodes, edges)
                    if n > 0 and e > 0
                ],
                buckets,
            )
        self.buckets = tuple(buckets)
        # global index: (store_idx, window_idx) grouped by bucket
        self.by_bucket: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
        for si, store in enumerate(self._stores):
            nodes, edges = sizes[si]
            for wi in range(store.num_windows):
                if nodes[wi] == 0 or edges[wi] == 0:
                    continue
                b = pick_bucket(int(nodes[wi]), int(edges[wi]), self.buckets)
                self.by_bucket.setdefault(b, []).append((si, wi))

    def __len__(self) -> int:
        return sum(
            (len(ws) + self.batch_size - 1) // self.batch_size
            for ws in self.by_bucket.values()
        )

    def epoch(self, shuffle: bool = True) -> Iterator[PaddedGraph]:
        batches: List[Tuple[Tuple[int, int], List[Tuple[int, int]]]] = []
        for b, entries in self.by_bucket.items():
            order = np.arange(len(entries))
            if shuffle:
                self._rng.shuffle(order)
            for lo in range(0, len(order), self.batch_size):
                batches.append(
                    (b, [entries[i] for i in order[lo : lo + self.batch_size]])
                )
        if shuffle:
            self._rng.shuffle(batches)

        for (mn, me), items in batches:
            # group the batch's windows by store; C++ fill per store, then
            # concatenate slots (typically one scene dominates a batch)
            slots = list(items) + [(-1, -1)] * (self.batch_size - len(items))
            parts = {}
            for si in {s for s, _ in items}:
                idxs = [wi if s == si else -1 for (s, wi) in slots]
                parts[si] = self._stores[si].fill_padded_batch(
                    idxs, mn, me, self.num_threads
                )
            # merge: take each slot from its owning store's fill
            merged = None
            for slot, (si, _) in enumerate(slots):
                src = parts.get(si)
                if src is None:
                    continue
                if merged is None:
                    merged = {k: v.copy() for k, v in src.items()}
                else:
                    for k in merged:
                        merged[k][slot] = src[k][slot]
            if merged is None:  # all-empty batch (cannot happen in practice)
                continue
            yield batch_to_padded_graph(merged)

    def close(self) -> None:
        for s in self._stores:
            s.close()


def make_batcher(
    store_paths: Sequence[str],
    batch_size: int,
    buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
    seed: int = 0,
    uniform: bool = False,
):
    """StoreGraphBatcher when the native loader is available, else an
    in-memory GraphBatcher over the numpy reader."""
    if native_available():
        return StoreGraphBatcher(
            store_paths, batch_size, buckets, seed, uniform=uniform
        )
    windows = []
    for p in store_paths:
        windows.extend(GraphStoreReader(p).windows())
    return GraphBatcher(windows, batch_size, buckets, seed=seed, uniform=uniform)
