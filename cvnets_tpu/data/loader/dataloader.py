"""Host-side data loader feeding the TPU.

Replaces torch's multi-process DataLoader (reference data/loader/dataloader.py:14-57).
Design: the batch sampler yields whole batches of (crop_h, crop_w, idx) tuples;
a thread pool fetches+transforms samples (PIL/numpy release the GIL for the heavy
parts), a background prefetch thread keeps ``prefetch_factor`` collated batches ready
so host decode overlaps device compute. ``update_indices``/``get_sample_indices``
support sample-efficient training like the reference subclass.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, List, Optional

_SENTINEL = object()


class CVNetsDataLoader:
    def __init__(
        self,
        dataset,
        batch_sampler,
        collate_fn: Optional[Callable] = None,
        num_workers: int = 0,
        prefetch_factor: int = 2,
        opts=None,
        **kwargs,
    ) -> None:
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.collate_fn = collate_fn
        self.num_workers = max(0, num_workers)
        self.prefetch_factor = max(1, prefetch_factor)
        self.opts = opts
        self._pool = (
            ThreadPoolExecutor(max_workers=self.num_workers)
            if self.num_workers > 0 else None
        )

    # -- reference CVNetsDataLoader API --------------------------------------
    def update_indices(self, new_indices: List[int]) -> None:
        if hasattr(self.batch_sampler, "img_indices"):
            self.batch_sampler.img_indices = new_indices
        if hasattr(self.batch_sampler, "update_indices"):
            self.batch_sampler.update_indices(new_indices)

    def get_sample_indices(self) -> List[int]:
        return self.batch_sampler.get_indices()

    def __len__(self) -> int:
        return len(self.batch_sampler)

    # -- iteration ------------------------------------------------------------
    # collates whose output the native whole-batch path reproduces exactly
    _NATIVE_BATCH_COLLATES = (
        "default_collate_fn", "image_classification_data_collate_fn",
    )

    def _collate_name(self) -> str:
        fn = self.collate_fn
        fn = getattr(fn, "func", fn)  # unwrap functools.partial
        return getattr(fn, "__name__", "")

    def _fetch_batch(self, batch_tuples) -> Dict:
        fetch_native = getattr(self.dataset, "fetch_batch_native", None)
        if (fetch_native is not None
                and (self.collate_fn is None
                     or self._collate_name() in self._NATIVE_BATCH_COLLATES)):
            out = fetch_native(batch_tuples)
            if out is not None:
                return out
        if self._pool is not None:
            items = list(self._pool.map(self.dataset.__getitem__, batch_tuples))
        else:
            items = [self.dataset[t] for t in batch_tuples]
        if self.collate_fn is not None:
            return self.collate_fn(items, self.opts)
        return items

    def __iter__(self) -> Iterator[Dict]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_factor)

        def producer():
            try:
                for batch_tuples in self.batch_sampler:
                    out_q.put(self._fetch_batch(batch_tuples))
            except BaseException as e:  # surface worker errors in the consumer
                out_q.put(e)
                return
            out_q.put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = out_q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
