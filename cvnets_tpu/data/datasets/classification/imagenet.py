"""ImageNet dataset (parity: reference data/datasets/classification/imagenet.py:35)."""

from cvnets_tpu.data.datasets import DATASET_REGISTRY
from cvnets_tpu.data.datasets.classification.base_image_classification_dataset import (
    BaseImageClassificationDataset,
)


@DATASET_REGISTRY.register(name="imagenet", type="classification")
class ImageNetDataset(BaseImageClassificationDataset):
    """ImageNet-1k in ImageFolder layout (train/<wnid>/*.JPEG)."""


class BaseImageNetShiftDataset(BaseImageClassificationDataset):
    """Distribution-shift sets evaluated with 1000-class models (reference
    data/datasets/classification/base_imagenet_shift_dataset.py): the shift set's
    classes are a subset of ImageNet-1k; logits are projected onto the subset at
    eval time. The canonical 1000-class order is the sorted wnid order, so the
    projection indices come from ranking this set's wnids against
    ``--dataset.imagenet-shift.wnid-file`` (one wnid per line, canonical order)
    or, if absent, a training-root class listing."""

    def _full_wnid_order(self):
        import os

        wnid_file = getattr(self.opts, "dataset.imagenet_shift.wnid_file", None)
        if wnid_file and os.path.isfile(wnid_file):
            with open(wnid_file) as f:
                return [l.strip() for l in f if l.strip()]
        train_root = getattr(self.opts, "dataset.root_train", None)
        if train_root and os.path.isdir(train_root):
            return sorted(d.name for d in os.scandir(train_root) if d.is_dir())
        return None

    def share_dataset_arguments(self):
        out = {}
        full = self._full_wnid_order()
        if full:
            rank = {w: i for i, w in enumerate(full)}
            subset = [rank[c] for c in self.classes if c in rank]
            if len(subset) == len(self.classes):
                out["stats.logit_subset_indices"] = subset
        # model stays 1000-way; metric-time projection handles the subset
        return out


@DATASET_REGISTRY.register(name="imagenet_a", type="classification")
class ImageNetADataset(BaseImageNetShiftDataset):
    """ImageNet-A natural adversarial examples (200-class subset)."""


@DATASET_REGISTRY.register(name="imagenet_r", type="classification")
class ImageNetRDataset(BaseImageNetShiftDataset):
    """ImageNet-R renditions shift set (200-class subset)."""


@DATASET_REGISTRY.register(name="imagenet_sketch", type="classification")
class ImageNetSketchDataset(BaseImageNetShiftDataset):
    """ImageNet-Sketch shift set (full 1000 classes)."""


@DATASET_REGISTRY.register(name="imagenet_v2", type="classification")
class ImageNetV2Dataset(BaseImageClassificationDataset):
    """ImageNetV2 re-collected test sets (reference imagenet_v2.py): all 1000
    classes, but folders are the NUMERIC class indices ("0".."999") of the
    canonical sorted-wnid order rather than wnids — remap folder-name order
    (lexicographic "0","1","10",...) to numeric so labels line up. The split
    (matched-frequency / threshold-0.7 / top-images) is chosen by pointing the
    val/test root at the corresponding directory."""

    # split name -> extracted folder name (reference IMAGENETv2_SPLIT_LINK_MAP)
    SPLIT_FOLDERS = {
        "matched-frequency": "imagenetv2-matched-frequency-format-val",
        "threshold-0.7": "imagenetv2-threshold0.7-format-val",
        "top-images": "imagenetv2-top-images-format-val",
    }

    def _dataset_root(self):
        root = super()._dataset_root()
        # reference flag: --dataset.imagenet-v2.split picks the extracted
        # subfolder under the root; pointing the root directly at a split
        # directory still works (no flag / folder absent)
        split = getattr(self.opts, "dataset.imagenet_v2.split", None)
        if root and split in self.SPLIT_FOLDERS:
            import os

            cand = os.path.join(root, self.SPLIT_FOLDERS[split])
            if os.path.isdir(cand):
                return cand
        return root

    @classmethod
    def add_arguments(cls, parser):
        if cls.__name__ != "ImageNetV2Dataset":
            return parser
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--dataset.imagenet-v2.split", type=str,
                           default=None,
                           choices=list(cls.SPLIT_FOLDERS),
                           help="ImageNetV2 variant subfolder under the root")
        return parser

    def __init__(self, opts, *args, **kwargs) -> None:
        super().__init__(opts, *args, **kwargs)
        if self.classes and all(c.isdigit() for c in self.classes):
            # ImageFolder sorted lexicographically; relabel numerically
            remap = {i: int(c) for i, c in enumerate(self.classes)}
            self.samples = [(p, remap[t]) for p, t in self.samples]
            self.classes = sorted(self.classes, key=int)


@DATASET_REGISTRY.register(name="places365", type="classification")
class Places365Dataset(BaseImageClassificationDataset):
    """Places365 scene classification (reference
    data/datasets/classification/places365.py)."""
