"""ImageNet dataset (parity: reference data/datasets/classification/imagenet.py:35)."""

from cvnets_tpu.data.datasets import DATASET_REGISTRY
from cvnets_tpu.data.datasets.classification.base_image_classification_dataset import (
    BaseImageClassificationDataset,
)


@DATASET_REGISTRY.register(name="imagenet", type="classification")
class ImageNetDataset(BaseImageClassificationDataset):
    """ImageNet-1k in ImageFolder layout (train/<wnid>/*.JPEG)."""


@DATASET_REGISTRY.register(name="imagenet_a", type="classification")
class ImageNetADataset(BaseImageClassificationDataset):
    """ImageNet-A natural adversarial examples (reference
    data/datasets/classification/imagenet_a.py); 200-class subset evaluated by
    projecting logits onto the subset at metric time."""


@DATASET_REGISTRY.register(name="imagenet_r", type="classification")
class ImageNetRDataset(BaseImageClassificationDataset):
    """ImageNet-R renditions shift set."""


@DATASET_REGISTRY.register(name="imagenet_sketch", type="classification")
class ImageNetSketchDataset(BaseImageClassificationDataset):
    """ImageNet-Sketch shift set."""


@DATASET_REGISTRY.register(name="places365", type="classification")
class Places365Dataset(BaseImageClassificationDataset):
    """Places365 scene classification (reference
    data/datasets/classification/places365.py)."""
