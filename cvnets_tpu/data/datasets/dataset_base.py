"""Base dataset (parity: reference data/datasets/dataset_base.py:21-325).

Datasets are host-side python objects; ``__getitem__`` receives the sampler's
``(crop_h, crop_w, index)`` tuple and returns a dict ``{"samples", "targets", ...}``
of numpy arrays. Device transfer/sharding happens in the loader/trainer, never here.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from cvnets_tpu.utils import logger


class BaseDataset:
    def __init__(self, opts, is_training: bool = True, is_evaluation: bool = False,
                 *args, **kwargs) -> None:
        self.opts = opts
        self.is_training = is_training
        self.is_evaluation = is_evaluation
        self.root = self._dataset_root()
        self.device = getattr(opts, "dev.device", None)

    def _dataset_root(self) -> Optional[str]:
        if self.is_training:
            return getattr(self.opts, "dataset.root_train", None)
        if self.is_evaluation:
            return getattr(self.opts, "dataset.root_test", None) or getattr(
                self.opts, "dataset.root_val", None
            )
        return getattr(self.opts, "dataset.root_val", None)

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        if cls != BaseDataset:
            return parser
        group = parser.add_argument_group(title="Dataset arguments")
        group.add_argument("--dataset.root-train", type=str, default="")
        group.add_argument("--dataset.root-val", type=str, default="")
        group.add_argument("--dataset.root-test", type=str, default="")
        group.add_argument("--dataset.name", type=str, default=None)
        group.add_argument("--dataset.decoder", type=str, default="native",
                           choices=["pil", "native"],
                           help="image decode path: 'native' collapses JPEG "
                                "decode+crop+resize into the C++ thread-pooled "
                                "decoder when the pipeline allows, falling "
                                "back to PIL otherwise")
        group.add_argument("--dataset.category", type=str, default="classification")
        group.add_argument("--dataset.train-batch-size0", type=int, default=128)
        group.add_argument("--dataset.val-batch-size0", type=int, default=1)
        group.add_argument("--dataset.eval-batch-size0", type=int, default=1)
        group.add_argument("--dataset.workers", type=int, default=-1)
        group.add_argument("--dataset.dali-workers", type=int, default=-1)
        group.add_argument("--dataset.persistent-workers", action="store_true",
                           default=False)
        group.add_argument("--dataset.pin-memory", action="store_true", default=False)
        group.add_argument("--dataset.prefetch-factor", type=int, default=2)
        group.add_argument("--dataset.img-dtype", type=str, default="float",
                           choices=["float", "half", "bfloat16"])
        group.add_argument("--dataset.cache-images-on-ram", action="store_true")
        group.add_argument("--dataset.cache-limit", type=float, default=80.0)
        group.add_argument("--dataset.decode-data-on-gpu", action="store_true",
                           help="Config-compat; decode stays on host for TPU")
        group.add_argument("--dataset.sampler-type", type=str, default="batch")
        group.add_argument("--dataset.pad-sample-size", type=int, default=0)
        group.add_argument("--dataset.collate-fn-name-train", type=str,
                           default="default_collate_fn")
        group.add_argument("--dataset.collate-fn-name-val", type=str,
                           default="default_collate_fn")
        group.add_argument("--dataset.collate-fn-name-test", type=str,
                           default="default_collate_fn")
        group.add_argument("--dataset.percentage-of-samples", type=float, default=100.0)
        group.add_argument("--dataset.imagenet-shift.wnid-file", type=str,
                           default=None,
                           help="Canonical 1000-wnid order for shift-set logit"
                                " projection (one wnid per line)")
        group.add_argument("--dataset.detection.no-background-id",
                           action="store_true", default=False,
                           help="Contiguous detection labels start at 0 (no "
                                "background slot); reference coco_base semantics")
        group.add_argument("--dataset.padding-index", type=int, default=None,
                           help="Padding token index for text pipelines "
                                "(reference dataset.padding_index)")
        # reference dataset.sample_efficient_training.* (training_engine reads
        # these; common.* setattr remains a fallback for tests)
        group.add_argument("--dataset.sample-efficient-training.enable",
                           action="store_true", default=False)
        group.add_argument(
            "--dataset.sample-efficient-training.sample-confidence",
            type=float, default=None)
        group.add_argument(
            "--dataset.sample-efficient-training.find-easy-samples-every-k-epochs",
            type=int, default=None)
        group.add_argument(
            "--dataset.sample-efficient-training.min-sample-frequency",
            type=int, default=None)
        group.add_argument("--dataset.disable-val", action="store_true",
                           default=False,
                           help="Skip building the validation dataset/loader")
        group.add_argument("--dataset.num-samples-per-category", type=int,
                           default=-1,
                           help="Balanced training subset: keep this many "
                                "samples per class (exclusive with "
                                "percentage-of-samples)")
        group.add_argument("--dataset.sample-selection-random-seed", type=int,
                           default=None,
                           help="Seed for subset sampling; defaults to "
                                "--common.seed")
        return parser

    # -- metadata hooks (reference :260-303) ---------------------------------
    def share_dataset_arguments(self) -> Dict[str, Any]:
        """Values to push back into opts (e.g. n_classes) after dataset build."""
        return {}

    def get_item_metadata(self, item_idx: int) -> Dict:
        raise NotImplementedError

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, sample_size_and_index: Tuple[int, int, int]) -> Dict:
        raise NotImplementedError

    @staticmethod
    def _parse_batch_tuple(
        sample_size_and_index: Union[Tuple[int, int, int], int]
    ) -> Tuple[int, int, int]:
        """Samplers yield (crop_h, crop_w, idx); plain int idx also accepted."""
        if isinstance(sample_size_and_index, (tuple, list)):
            return tuple(sample_size_and_index)
        return (-1, -1, int(sample_size_and_index))

    def __repr__(self) -> str:
        return (
            f"{self.__class__.__name__}(root={self.root}, "
            f"is_training={self.is_training}, n_samples={self.safe_len()})"
        )

    def safe_len(self):
        try:
            return len(self)
        except NotImplementedError:
            return "?"


class BaseImageDataset(BaseDataset):
    """Adds PIL image reading with corrupt-image tolerance (reference
    dataset_base.py:309-325: returns None on corrupt images; collate drops them)."""

    @staticmethod
    def read_image_pil(path: str):
        try:
            from PIL import Image

            img = Image.open(path).convert("RGB")
            return img
        except Exception:
            return None

    @staticmethod
    def read_mask_pil(path: str):
        try:
            from PIL import Image

            return Image.open(path)
        except Exception:
            return None
