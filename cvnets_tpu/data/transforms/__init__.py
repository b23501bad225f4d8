"""Transform registry (parity: reference data/transforms/__init__.py:11).

Two tiers, TPU-first (BASELINE north star):
* host tier — per-sample geometry ops on PIL/numpy (decode, random-resized-crop,
  flip, resize, center-crop) executed in loader workers;
* device tier — batched, jit-compatible ops (mixup/cutmix, RandAugment photometric
  ops, normalization) in cvnets_tpu/ops/image_ops.py applied to whole batches on TPU.
"""

from __future__ import annotations

import argparse

from cvnets_tpu.utils.registry import Registry

TRANSFORMATIONS_REGISTRY = Registry(
    registry_name="transforms",
    lazy_load_dirs=["data/transforms"],
)


def arguments_augmentation(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    from cvnets_tpu.ops.image_ops import arguments_device_augmentation
    from cvnets_tpu.ops.mixing import arguments_mixing

    parser = arguments_mixing(parser)
    parser = arguments_device_augmentation(parser)
    return TRANSFORMATIONS_REGISTRY.all_arguments(parser)
