"""Loader factory (parity: reference data/data_loaders.py:21-163)."""

from __future__ import annotations

from typing import Optional, Tuple

from cvnets_tpu.data.collate import build_collate_fn
from cvnets_tpu.data.datasets import get_test_dataset, get_train_val_datasets
from cvnets_tpu.data.loader.dataloader import CVNetsDataLoader
from cvnets_tpu.data.sampler import build_sampler
from cvnets_tpu.utils import logger


def _n_workers(opts) -> int:
    n = getattr(opts, "dataset.workers", -1)
    if n is None or n < 0:
        import os

        n = min(16, (os.cpu_count() or 4))
    return n


def create_test_loader(opts) -> CVNetsDataLoader:
    """Eval loader; variable samplers are downgraded to the fixed batch sampler
    (reference data/data_loaders.py:46-49)."""
    test_dataset = get_test_dataset(opts)
    for k, v in (test_dataset.share_dataset_arguments() or {}).items():
        setattr(opts, k, v)
    # eval batch size overrides the val one (reference data_loaders.py:28-33)
    eval_bsz = getattr(opts, "dataset.eval_batch_size0", None)
    if eval_bsz:
        setattr(opts, "dataset.val_batch_size0", eval_bsz)
    sampler_name = getattr(opts, "sampler.name", "batch_sampler")
    if sampler_name.startswith(("variable_batch_sampler", "multi_scale_sampler")):
        setattr(opts, "sampler.name", "batch_sampler")
        crop_h = getattr(opts, "sampler.vbs.crop_size_height", 256)
        crop_w = getattr(opts, "sampler.vbs.crop_size_width", 256)
        setattr(opts, "sampler.bs.crop_size_height", crop_h)
        setattr(opts, "sampler.bs.crop_size_width", crop_w)
    test_sampler = build_sampler(
        opts, n_data_samples=len(test_dataset), is_training=False
    )
    return CVNetsDataLoader(
        dataset=test_dataset,
        batch_sampler=test_sampler,
        collate_fn=build_collate_fn(opts, "test"),
        num_workers=_n_workers(opts),
        prefetch_factor=getattr(opts, "dataset.prefetch_factor", 2),
        opts=opts,
    )


def create_train_val_loader(opts) -> Tuple[CVNetsDataLoader, Optional[CVNetsDataLoader], object]:
    train_dataset, valid_dataset = get_train_val_datasets(opts)

    # push dataset-derived opts (e.g. n_classes) back, reference
    # dataset_base.py:260 share_dataset_arguments
    for k, v in (train_dataset.share_dataset_arguments() or {}).items():
        setattr(opts, k, v)

    train_sampler = build_sampler(
        opts, n_data_samples=len(train_dataset), is_training=True,
        get_item_metadata=getattr(train_dataset, "get_item_metadata", None),
    )
    train_loader = CVNetsDataLoader(
        dataset=train_dataset,
        batch_sampler=train_sampler,
        collate_fn=build_collate_fn(opts, "train"),
        num_workers=_n_workers(opts),
        prefetch_factor=getattr(opts, "dataset.prefetch_factor", 2),
        opts=opts,
    )

    val_loader = None
    if valid_dataset is not None:
        val_sampler = build_sampler(
            opts, n_data_samples=len(valid_dataset), is_training=False
        )
        val_loader = CVNetsDataLoader(
            dataset=valid_dataset,
            batch_sampler=val_sampler,
            collate_fn=build_collate_fn(opts, "val"),
            num_workers=_n_workers(opts),
            prefetch_factor=getattr(opts, "dataset.prefetch_factor", 2),
            opts=opts,
        )
    return train_loader, val_loader, train_sampler
