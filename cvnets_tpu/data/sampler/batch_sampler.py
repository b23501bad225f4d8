"""Fixed-resolution batch sampler (parity: reference data/sampler/batch_sampler.py:15-91)."""

from __future__ import annotations

import argparse
from typing import Iterator, List, Tuple

from cvnets_tpu.constants import DEFAULT_IMAGE_HEIGHT, DEFAULT_IMAGE_WIDTH
from cvnets_tpu.data.sampler import SAMPLER_REGISTRY
from cvnets_tpu.data.sampler.base_sampler import BaseSampler


@SAMPLER_REGISTRY.register(name="batch_sampler")
class BatchSampler(BaseSampler):
    def __init__(self, opts, n_data_samples: int, is_training: bool = True,
                 **kwargs) -> None:
        super().__init__(opts, n_data_samples, is_training, **kwargs)
        self.crop_size_h = getattr(opts, "sampler.bs.crop_size_height",
                                   DEFAULT_IMAGE_HEIGHT)
        self.crop_size_w = getattr(opts, "sampler.bs.crop_size_width",
                                   DEFAULT_IMAGE_WIDTH)
        if is_training:
            self.batch_size = getattr(opts, "dataset.train_batch_size0", 32)
        else:
            self.batch_size = getattr(opts, "dataset.val_batch_size0", 32)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BatchSampler:
            return parser
        group = parser.add_argument_group(cls.__name__)
        group.add_argument("--sampler.bs.crop-size-width", type=int,
                           default=DEFAULT_IMAGE_WIDTH)
        group.add_argument("--sampler.bs.crop-size-height", type=int,
                           default=DEFAULT_IMAGE_HEIGHT)
        return parser

    def __iter__(self) -> Iterator[List[Tuple[int, int, int]]]:
        indices = self.get_indices_rank_i()
        bsz = self.effective_batch_size(self.batch_size)
        for start in range(0, len(indices), bsz):
            batch = indices[start: start + bsz]
            if not batch:
                continue
            if len(batch) < bsz:
                # keep shapes static for XLA: pad the trailing batch
                batch = self._pad_cyclic(batch, indices, bsz)
            yield [(self.crop_size_h, self.crop_size_w, idx) for idx in batch]

    def __len__(self) -> int:
        n = len(self.get_indices_rank_i())
        return -(-n // self.effective_batch_size(self.batch_size))

    def extra_repr(self) -> str:
        return (super().extra_repr()
                + f", batch_size={self.batch_size},"
                  f" crop=({self.crop_size_h}x{self.crop_size_w})")


# alias for reference config compatibility
SAMPLER_REGISTRY.register(name="batch_sampler_ddp")(
    type("BatchSamplerDDP", (BatchSampler,), {})
)
