"""Sampler registry (parity: reference data/sampler/__init__.py:14)."""

from __future__ import annotations

import argparse

from cvnets_tpu.data.sampler.base_sampler import BaseSampler
from cvnets_tpu.utils.registry import Registry

SAMPLER_REGISTRY = Registry(
    registry_name="sampler",
    base_class=BaseSampler,
    lazy_load_dirs=["data/sampler"],
)


def add_sampler_arguments(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Sampler arguments")
    group.add_argument("--sampler.name", type=str, default="batch_sampler")
    group.add_argument("--sampler.use-shards", action="store_true", default=False)
    group.add_argument("--sampler.num-repeats", type=int, default=1,
                       help="Repeated augmentation factor")
    group.add_argument("--sampler.truncated-repeat-aug-sampler", action="store_true",
                       default=False)
    group.add_argument("--sampler.disable-shuffle-sharding", action="store_true",
                       default=False)
    return SAMPLER_REGISTRY.all_arguments(parser)


def build_sampler(opts, n_data_samples: int, is_training: bool = False,
                  get_item_metadata=None, *args, **kwargs) -> BaseSampler:
    """Build the sampler named by ``sampler.name``.

    The reference picks the *_ddp variant when running distributed; cvnets_tpu samplers
    are natively shard-aware (rank/num_replicas default to this host's slice of the
    job), so the ddp names alias the same classes.
    """
    sampler_name = getattr(opts, "sampler.name", "batch_sampler")
    if sampler_name.endswith("_ddp"):
        sampler_name = sampler_name[: -len("_ddp")]
    return SAMPLER_REGISTRY[sampler_name](
        opts, n_data_samples=n_data_samples, is_training=is_training, *args, **kwargs
    )
