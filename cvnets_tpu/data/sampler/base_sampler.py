"""Base sampler (parity: reference data/sampler/base_sampler.py:18-306).

Samplers yield *whole batches* of ``(crop_h, crop_w, sample_index)`` tuples — the
reference's batching-strategy layer. cvnets_tpu samplers are natively shard-aware:
``rank``/``num_replicas`` default to this host's slice of a multi-host job
(`jax.process_index()`/`process_count()`), collapsing the reference's Non-DDP/DDP
class pairs into one. Per-epoch RNG is seeded with (seed + epoch) so every host
draws an identical (h, w, bsz) schedule, which GSPMD requires for consistent
global shapes.
"""

from __future__ import annotations

import argparse
import copy
import random
from typing import Iterator, List, Optional, Tuple

import numpy as np


class BaseSampler:
    def __init__(self, opts, n_data_samples: int, is_training: bool = True,
                 rank: Optional[int] = None, num_replicas: Optional[int] = None,
                 ) -> None:
        self.opts = opts
        self.n_data_samples = n_data_samples
        self.is_training = is_training
        self.shuffle = bool(is_training)
        self.epoch = 0
        self.start_index = 0

        if num_replicas is None or rank is None:
            try:
                import jax

                num_replicas = jax.process_count()
                rank = jax.process_index()
            except Exception:
                num_replicas, rank = 1, 0
        self.num_replicas = num_replicas
        self.rank = rank

        num_repeats = getattr(opts, "sampler.num_repeats", 1) if is_training else 1
        self.num_repeats = max(1, num_repeats or 1)
        self.trunc_rep_aug = getattr(opts, "sampler.truncated_repeat_aug_sampler", False)
        self.use_shards = getattr(opts, "sampler.use_shards", False)
        self.seed = getattr(opts, "common.seed", 0) or 0

        n_total = n_data_samples if self.trunc_rep_aug else n_data_samples * self.num_repeats
        # pad so batches divide evenly across replicas (reference :101-124)
        self.n_samples_per_replica = -(-n_total // self.num_replicas)
        self.total_size = self.n_samples_per_replica * self.num_replicas

        # TPU delta: configs give the per-device batch size ("128 images per GPU × 8
        # GPUs"); under GSPMD one process feeds the whole local mesh, so samplers
        # scale batch sizes by the local device count to keep the global batch
        # divisible across the data axis.
        try:
            import jax

            self.n_device_mult = max(1, jax.local_device_count())
        except Exception:
            self.n_device_mult = 1

    def effective_batch_size(self, bsz: int) -> int:
        return max(1, int(bsz)) * self.n_device_mult

    @staticmethod
    def _pad_cyclic(batch: list, indices: list, bsz: int) -> list:
        """Pad a trailing batch to exactly ``bsz`` by cycling indices (static shapes
        for XLA; reference drops or pads per-rank)."""
        if len(batch) >= bsz:
            return batch[:bsz]
        reps = -(-(bsz - len(batch)) // max(1, len(indices)))
        return (batch + indices * reps)[:bsz]

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        return parser

    # ------------------------------------------------------------------ epoch
    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def update_scales(self, epoch: int, is_master_node: bool = False) -> None:
        """Hook for multi-scale samplers (reference variable_batch_sampler.py:109)."""

    def update_indices(self, new_indices: List[int]) -> None:
        """Hook for sample-efficient training (reference CVNetsDataLoader)."""

    # ---------------------------------------------------------------- indices
    img_indices: Optional[List[int]] = None  # set by update_indices (sample-eff.)

    def get_indices(self) -> List[int]:
        """Shuffled (by epoch-seeded RNG), repeated, padded global index list."""
        img_indices = (list(self.img_indices) if self.img_indices is not None
                       else list(range(self.n_data_samples)))
        rng = random.Random(self.seed + self.epoch)
        if self.shuffle:
            rng.shuffle(img_indices)
        if self.num_repeats > 1:
            img_indices = [i for i in img_indices for _ in range(self.num_repeats)]
            if self.trunc_rep_aug:
                img_indices = img_indices[: self.n_data_samples]
        # pad to total_size
        if len(img_indices) < self.total_size:
            img_indices += img_indices[: self.total_size - len(img_indices)]
        return img_indices

    def get_indices_rank_i(self) -> List[int]:
        """This replica's shard: contiguous block when ``use_shards`` (node-sharded
        reads), strided interleave otherwise (reference :224-306)."""
        indices = self.get_indices()
        if self.use_shards:
            start = self.rank * self.n_samples_per_replica
            return indices[start: start + self.n_samples_per_replica]
        return indices[self.rank:: self.num_replicas]

    def __iter__(self) -> Iterator[List[Tuple[int, int, int]]]:
        raise NotImplementedError

    def __len__(self) -> int:
        raise NotImplementedError

    def extra_repr(self) -> str:
        return (
            f"num_repeats={self.num_repeats}, rank={self.rank},"
            f" num_replicas={self.num_replicas}"
        )

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}({self.extra_repr()})"
