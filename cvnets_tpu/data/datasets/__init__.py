"""Dataset registry (parity: reference data/datasets/__init__.py:23)."""

from __future__ import annotations

import argparse

from cvnets_tpu.data.datasets.dataset_base import BaseDataset
from cvnets_tpu.utils.registry import Registry

DATASET_REGISTRY = Registry(
    registry_name="dataset",
    base_class=BaseDataset,
    lazy_load_dirs=["data/datasets"],
)


def arguments_dataset(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    parser = BaseDataset.add_arguments(parser)
    return DATASET_REGISTRY.all_arguments(parser)


def build_dataset_from_registry(opts, is_training: bool = True,
                                is_evaluation: bool = False, *args, **kwargs):
    dataset_name = getattr(opts, "dataset.name")
    category = getattr(opts, "dataset.category")
    return DATASET_REGISTRY[dataset_name, category](
        opts, is_training=is_training, is_evaluation=is_evaluation, *args, **kwargs
    )


def get_train_val_datasets(opts):
    train_ds = build_dataset_from_registry(opts, is_training=True)
    # reference data/datasets/__init__.py:109: --dataset.disable-val skips
    # building the validation dataset entirely (pretrain-style runs)
    if getattr(opts, "dataset.disable_val", False):
        return train_ds, None
    # reference CLIP recipes validate zero-shot mid-training:
    # --dataset.multi-modal-img-text.zero-shot-eval swaps the val dataset for
    # the zero-shot one (reference zero_shot/__init__.py:36 + clip configs)
    if (getattr(opts, "dataset.category", None) == "multi_modal_image_text"
            and getattr(opts, "dataset.multi_modal_img_text.zero_shot_eval",
                        False)):
        import argparse as _ap

        zs_opts = _ap.Namespace(**vars(opts))
        setattr(zs_opts, "dataset.name", getattr(
            opts, "dataset.multi_modal_img_text.zero_shot.name", None)
            or "imagenet_zero_shot")
        zs_root = getattr(
            opts, "dataset.multi_modal_img_text.zero_shot.root_val", None)
        if zs_root:
            setattr(zs_opts, "dataset.root_val", zs_root)
        val_ds = build_dataset_from_registry(zs_opts, is_training=False)
    else:
        val_ds = build_dataset_from_registry(opts, is_training=False)
    return train_ds, val_ds


def get_test_dataset(opts):
    return build_dataset_from_registry(opts, is_training=False, is_evaluation=True)
