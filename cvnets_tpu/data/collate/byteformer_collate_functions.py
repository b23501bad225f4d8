"""Variable-length byte-sequence collates for ByteFormer (parity: reference
data/collate_fns/byteformer_collate_functions.py:29,244).

TPU delta: sequences pad to the next power-of-two *bucket* rather than the batch
max, bounding the set of compiled shapes (XLA recompiles per length)."""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from cvnets_tpu.data.collate import COLLATE_FN_REGISTRY

PAD_VALUE = -1
MIN_BUCKET = 256


def _bucket_len(n: int) -> int:
    b = MIN_BUCKET
    while b < n:
        b *= 2
    return b


def _pad_batch(seqs: List[np.ndarray]) -> np.ndarray:
    max_len = max(len(s) for s in seqs)
    bucket = _bucket_len(max_len)
    out = np.full((len(seqs), bucket), PAD_VALUE, np.int32)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out


@COLLATE_FN_REGISTRY.register(name="byteformer_image_collate_fn")
def byteformer_image_collate_fn(batch: List[Dict], opts=None) -> Dict:
    seqs = [np.asarray(b["samples"]).reshape(-1) for b in batch]
    return {
        "samples": _pad_batch(seqs),
        "targets": np.asarray([b["targets"] for b in batch], np.int32),
    }


@COLLATE_FN_REGISTRY.register(name="byteformer_audio_collate_fn")
def byteformer_audio_collate_fn(batch: List[Dict], opts=None) -> Dict:
    return byteformer_image_collate_fn(batch, opts)
