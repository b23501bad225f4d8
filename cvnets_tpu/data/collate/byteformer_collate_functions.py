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


def _pad_batch(seqs: List[np.ndarray], opts=None) -> np.ndarray:
    # pad value comes from the model contract (reference
    # byteformer_collate_functions.py:105)
    pad = PAD_VALUE if opts is None else getattr(
        opts, "model.classification.byteformer.padding_index", PAD_VALUE)
    max_len = max(len(s) for s in seqs)
    bucket = _bucket_len(max_len)
    out = np.full((len(seqs), bucket), pad, np.int32)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out


def _byte_transform_chain(opts):
    """Flag-gated byte transforms in reference order
    (byteformer_collate_functions.py:46-51): pil_save -> shuffle_bytes ->
    mask_positions -> random_uniform -> byte_permutation."""
    if opts is None:
        return []
    from cvnets_tpu.data.transforms.image_bytes import (
        BytePermutation,
        MaskPositions,
        PILSave,
        RandomUniformNoise,
        ShuffleBytes,
    )

    chain = []
    for flag, cls in (
        ("image_augmentation.pil_save.enable", PILSave),
        ("image_augmentation.shuffle_bytes.enable", ShuffleBytes),
        ("image_augmentation.mask_positions.enable", MaskPositions),
        ("image_augmentation.random_uniform.enable", RandomUniformNoise),
        ("image_augmentation.byte_permutation.enable", BytePermutation),
    ):
        if getattr(opts, flag, False):
            chain.append(cls(opts))
    return chain


@COLLATE_FN_REGISTRY.register(name="byteformer_image_collate_fn")
def byteformer_image_collate_fn(batch: List[Dict], opts=None) -> Dict:
    chain = _byte_transform_chain(opts)
    seqs = []
    for b in batch:
        item = {"image": b["samples"]}
        for t in chain:
            item = t(item)
        seqs.append(np.asarray(item["image"]).reshape(-1))
    return {
        "samples": _pad_batch(seqs, opts),
        "targets": np.asarray([b["targets"] for b in batch], np.int32),
    }


@COLLATE_FN_REGISTRY.register(name="byteformer_audio_collate_fn")
def byteformer_audio_collate_fn(batch: List[Dict], opts=None) -> Dict:
    # serialize the (augmented) waveform to file bytes at collate time
    # (reference byteformer_collate_functions.py:243-267 apply_torchaudio_save)
    if opts is not None and getattr(
            opts, "audio_augmentation.torchaudio_save.enable", False):
        from cvnets_tpu.data.transforms.audio_bytes import TorchaudioSave

        t = TorchaudioSave(opts)
        for b in batch:
            s = np.asarray(b["samples"])
            if np.issubdtype(s.dtype, np.floating):
                item = {"samples": {"audio": s},
                        "metadata": b.get("metadata",
                                          {"audio_fps": 16000})}
                b["samples"] = t(item)["samples"]["audio"]
    return byteformer_image_collate_fn(batch, opts)
