"""Image-text datasets for CLIP training (parity: reference
data/datasets/multi_modal_img_text/base_multi_modal_img_text.py:485 + flickr.py +
img_text_tar_dataset.py:407).

``flickr``-style datasets read (image, caption) pairs from a TSV/JSONL manifest;
captions are tokenized host-side with the registered tokenizer. The zero-shot
variant builds per-class multi-caption token tensors from prompt templates
(reference zero_shot/imagenet templates)."""

from __future__ import annotations

import json
import os
import re
import random
from typing import Dict, List, Optional, Tuple

import numpy as np

from cvnets_tpu.data.collate import COLLATE_FN_REGISTRY
from cvnets_tpu.data.datasets import DATASET_REGISTRY
from cvnets_tpu.data.datasets.dataset_base import BaseImageDataset
from cvnets_tpu.data.text_tokenizer import build_tokenizer
from cvnets_tpu.data.transforms.common import Compose
from cvnets_tpu.data.transforms.image import (
    RandomResizedCrop,
    Resize,
    ToFloatTensor,
)
from cvnets_tpu.utils import logger

import json as _json

_ZS_ASSET = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets",
                         "clip_imagenet_zero_shot.json")


def _load_zero_shot_asset():
    """All 80 canonical OpenAI CLIP prompt templates + the 1000 ImageNet class
    names (packaged JSON; parity: reference zero_shot/templates.py +
    imagenet_class_names.py)."""
    with open(_ZS_ASSET) as f:
        blob = _json.load(f)
    return blob["templates"], blob["imagenet_class_names"]


ZERO_SHOT_TEMPLATES, IMAGENET_CLASS_NAMES = _load_zero_shot_asset()



class BaseMultiModalImgText(BaseImageDataset):
    def __init__(self, opts, is_training: bool = True, is_evaluation: bool = False,
                 *args, **kwargs) -> None:
        super().__init__(opts, is_training=is_training, is_evaluation=is_evaluation,
                         *args, **kwargs)
        if getattr(opts, "text_tokenizer.name", None) is None:
            setattr(opts, "text_tokenizer.name", "clip")
        self.tokenizer = build_tokenizer(opts)
        self.samples: List[Tuple[str, str]] = []  # (image_path, caption)

    @classmethod
    def add_arguments(cls, parser):
        # the base class is not a registry entry, so these family-wide flags
        # are registered exactly once via the first registered subclass that
        # does not override add_arguments (FlickrDataset)
        if cls.__name__ != "FlickrDataset":
            return parser
        group = parser.add_argument_group(title="BaseMultiModalImgText")
        # reference flags (base_multi_modal_img_text.py + clip recipes)
        group.add_argument("--dataset.multi-modal-img-text.context-length",
                           type=int, default=None,
                           help="Token context length; falls back to "
                                "--model.text.context-length when unset")
        group.add_argument("--dataset.multi-modal-img-text.zero-shot-eval",
                           action="store_true", default=False,
                           help="Validate zero-shot classification instead of "
                                "the training dataset's val split")
        group.add_argument("--dataset.multi-modal-img-text.zero-shot.name",
                           type=str, default=None)
        group.add_argument("--dataset.multi-modal-img-text.zero-shot.root-val",
                           type=str, default=None)
        group.add_argument("--dataset.multi-modal-img-text.trunc-seq-len",
                           action="store_true", default=False,
                           help="Config-compat; sequences are fixed-length "
                                "padded on TPU (static shapes)")
        return parser

    def _transforms(self, size: Tuple[int, int]):
        if self.is_training:
            return Compose(self.opts, [RandomResizedCrop(self.opts, size=size),
                                       ToFloatTensor(self.opts)])
        return Compose(self.opts, [Resize(self.opts, img_size=list(size)),
                                   ToFloatTensor(self.opts)])

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, sample_size_and_index) -> Dict:
        crop_h, crop_w, idx = self._parse_batch_tuple(sample_size_and_index)
        if crop_h <= 0:
            crop_h = crop_w = 224
        path, caption = self.samples[idx]
        img = self.read_image_pil(path)
        if img is None:
            return {
                "samples": {
                    "image": np.zeros((crop_h, crop_w, 3), np.float32),
                    "text": np.asarray(self.tokenizer("")),
                },
                "targets": -1,
                "sample_id": idx,
            }
        data = self._transforms((crop_h, crop_w))(
            {"image": img, "crop_size": (crop_h, crop_w)})
        return {
            "samples": {
                "image": np.asarray(data["image"], np.float32),
                "text": np.asarray(self.tokenizer(caption)),
            },
            "targets": idx,
            "sample_id": idx,
        }


@DATASET_REGISTRY.register(name="flickr", type="multi_modal_image_text")
class FlickrDataset(BaseMultiModalImgText):
    """Flickr30k/8k-style manifest: a ``captions.txt``/``.tsv`` (image \\t caption)
    or jsonl with {"image": ..., "caption": ...} lines."""

    def __init__(self, opts, is_training: bool = True, is_evaluation: bool = False,
                 *args, **kwargs) -> None:
        super().__init__(opts, is_training=is_training, is_evaluation=is_evaluation,
                         *args, **kwargs)
        root = self.root
        for name in ("captions.tsv", "captions.txt", "annotations.jsonl"):
            manifest = os.path.join(root or "", name)
            if os.path.isfile(manifest):
                with open(manifest) as f:
                    for line in f:
                        line = line.strip()
                        if not line:
                            continue
                        if name.endswith(".jsonl"):
                            blob = json.loads(line)
                            img, cap = blob["image"], blob["caption"]
                        else:
                            img, cap = line.split("\t", 1)
                        self.samples.append((os.path.join(root, img), cap))
                break


@DATASET_REGISTRY.register(name="img_text_tar", type="multi_modal_image_text")
class ImgTextTarDataset(FlickrDataset):
    """Large-scale tar-sharded image-text dataset (reference
    img_text_tar_dataset.py:407). Samples live in ``*.tar`` shards under the
    dataset root as paired members ``<key>.{jpg,jpeg,png,webp}`` +
    ``<key>.{txt,json}`` (caption). Shards are indexed once at startup — from
    ``--dataset.img-text-tar.metadata-file`` (json: {"samples": [[shard,
    img_member, txt_member], ...]}) when given, else by scanning tar headers —
    and streamed lazily at read time with one open handle per shard per worker
    thread (tarfile handles are not thread-safe; the loader is thread-based).
    A Flickr-style manifest in the root keeps working as a fallback."""

    _IMG_EXT = (".jpg", ".jpeg", ".png", ".webp", ".bmp")
    _TXT_EXT = (".txt", ".json")

    def __init__(self, opts, is_training: bool = True, is_evaluation: bool = False,
                 *args, **kwargs) -> None:
        super().__init__(opts, is_training=is_training, is_evaluation=is_evaluation,
                         *args, **kwargs)
        # (shard_path, img_member, txt_member_or_inline_caption, is_inline)
        self._tar_entries: List[Tuple[str, str, str, bool]] = []
        import threading

        self._tls = threading.local()
        if not self.samples:  # no Flickr-style manifest found
            self._index_shards()

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument(
            "--dataset.img-text-tar.metadata-file", type=str, default=None,
            help='Optional shard index: {"samples": [[shard, img_member,'
                 ' txt_member], ...]} — skips the startup tar scan')
        # reference-spelled aliases (img_text_tar_dataset.py); s3 streaming is
        # accepted for config compat but requires local shards in this build
        group.add_argument(
            "--dataset.multi-modal-img-text.img-text-tar.metadata-file",
            type=str, default=None)
        group.add_argument(
            "--dataset.multi-modal-img-text.img-text-tar.parallel-download",
            action="store_true", default=False)
        group.add_argument(
            "--dataset.multi-modal-img-text.img-text-tar.s3-bucket-path",
            type=str, default=None)
        return parser

    def _index_shards(self) -> None:
        import glob
        import tarfile

        root = self.root or ""
        if getattr(self.opts,
                   "dataset.multi_modal_img_text.img_text_tar.s3_bucket_path",
                   None):
            logger.error(
                "img_text_tar s3 streaming is not available in this build; "
                "download the shards locally and point --dataset.root-train "
                "at them.")
        meta_path = (getattr(
            self.opts,
            "dataset.multi_modal_img_text.img_text_tar.metadata_file", None)
            or getattr(self.opts, "dataset.img_text_tar.metadata_file", None))
        if meta_path and os.path.isfile(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            for shard, img_m, txt_m in meta.get("samples", []):
                if not os.path.isabs(shard):
                    shard = os.path.join(root, shard)
                self._tar_entries.append((shard, img_m, txt_m, False))
            return
        for shard in sorted(glob.glob(os.path.join(root, "*.tar"))):
            imgs: Dict[str, str] = {}
            txts: Dict[str, str] = {}
            with tarfile.open(shard) as tf:  # header walk only, no extraction
                for m in tf:
                    if not m.isfile():
                        continue
                    key, ext = os.path.splitext(m.name)
                    ext = ext.lower()
                    if ext in self._IMG_EXT:
                        imgs[key] = m.name
                    elif ext in self._TXT_EXT:
                        txts[key] = m.name
            for key in sorted(imgs):
                if key in txts:
                    self._tar_entries.append((shard, imgs[key], txts[key], False))

    def _shard_handle(self, shard: str):
        import tarfile

        cache = getattr(self._tls, "handles", None)
        if cache is None:
            cache = self._tls.handles = {}
        if shard not in cache:
            cache[shard] = tarfile.open(shard)
        return cache[shard]

    @staticmethod
    def _parse_caption(raw: bytes, member: str) -> str:
        text = raw.decode("utf-8", errors="replace")
        if member.endswith(".json"):
            try:
                blob = json.loads(text)
                return blob.get("caption") or blob.get("text") or ""
            except json.JSONDecodeError:
                return ""
        return text.strip()

    def __len__(self) -> int:
        return len(self._tar_entries) if self._tar_entries else len(self.samples)

    def __getitem__(self, sample_size_and_index) -> Dict:
        if not self._tar_entries:  # manifest fallback
            return super().__getitem__(sample_size_and_index)
        crop_h, crop_w, idx = self._parse_batch_tuple(sample_size_and_index)
        if crop_h <= 0:
            crop_h = crop_w = 224
        shard, img_m, txt_m, _ = self._tar_entries[idx]
        img = caption = None
        try:
            tf = self._shard_handle(shard)
            import io

            from PIL import Image

            img_bytes = tf.extractfile(img_m).read()
            caption = self._parse_caption(tf.extractfile(txt_m).read(), txt_m)
            img = Image.open(io.BytesIO(img_bytes)).convert("RGB")
        except Exception:
            img = None
        if img is None:
            return {
                "samples": {
                    "image": np.zeros((crop_h, crop_w, 3), np.float32),
                    "text": np.asarray(self.tokenizer("")),
                },
                "targets": -1,
                "sample_id": idx,
            }
        data = self._transforms((crop_h, crop_w))(
            {"image": img, "crop_size": (crop_h, crop_w)})
        return {
            "samples": {
                "image": np.asarray(data["image"], np.float32),
                "text": np.asarray(self.tokenizer(caption)),
            },
            "targets": idx,
            "sample_id": idx,
        }


@DATASET_REGISTRY.register(name="imagenet_zero_shot", type="multi_modal_image_text")
class ImageNetZeroShot(BaseImageDataset):
    """Zero-shot ImageNet eval for CLIP: images from ImageFolder; per-class caption
    token tensors from prompt templates (reference zero_shot/__init__.py:36).
    Class names come from ``--dataset.zero-shot.class-names-file`` (one per line;
    order must match the ImageFolder class order)."""

    def __init__(self, opts, is_training: bool = False, is_evaluation: bool = True,
                 *args, **kwargs) -> None:
        super().__init__(opts, is_training=False, is_evaluation=True,
                         *args, **kwargs)
        from cvnets_tpu.data.datasets.classification.base_image_classification_dataset import (  # noqa: E501
            BaseImageClassificationDataset,
        )

        self._inner = BaseImageClassificationDataset(
            opts, is_training=False, is_evaluation=True)
        if getattr(opts, "text_tokenizer.name", None) is None:
            setattr(opts, "text_tokenizer.name", "clip")
        self.tokenizer = build_tokenizer(opts)
        names_file = getattr(opts, "dataset.zero_shot.class_names_file", None)
        if names_file and os.path.isfile(names_file):
            with open(names_file) as f:
                self.class_names = [l.strip() for l in f if l.strip()]
        elif (len(self._inner.classes) == len(IMAGENET_CLASS_NAMES)
              or all(re.fullmatch(r"n\d{8}", c) for c in self._inner.classes[:5])):
            # ImageFolder wnid directory names would produce meaningless captions;
            # default to the canonical CLIP class-name table (reference
            # zero_shot/imagenet.py)
            self.class_names = IMAGENET_CLASS_NAMES[: len(self._inner.classes)]
        else:
            self.class_names = self._inner.classes

    @classmethod
    def add_arguments(cls, parser):
        group = parser.add_argument_group(title=cls.__name__)
        group.add_argument("--dataset.zero-shot.class-names-file", type=str,
                           default=None)
        group.add_argument("--dataset.zero-shot.templates", type=str, default=None)
        return parser

    def class_caption_tokens(self) -> np.ndarray:
        """(n_classes, n_templates, context_len) token tensor for text encoding."""
        out = []
        for name in self.class_names:
            out.append(np.stack([
                self.tokenizer(t.format(class_name=name)) for t in ZERO_SHOT_TEMPLATES
            ]))
        return np.stack(out)

    def __len__(self) -> int:
        return len(self._inner)

    def __getitem__(self, sample_size_and_index) -> Dict:
        return self._inner[sample_size_and_index]


@COLLATE_FN_REGISTRY.register(name="multi_modal_img_text_collate_fn")
def multi_modal_img_text_collate_fn(batch: List[Dict], opts=None) -> Dict:
    from cvnets_tpu.data.collate.collate_functions import default_collate_fn

    out = default_collate_fn(batch, opts)
    # reference base_multi_modal_img_text.py:435,461-464 truncates text to the
    # longest real sequence in the batch. TPU delta: round the cut up to a
    # 16-token bucket so XLA sees a handful of shapes, not one per batch.
    if opts is not None and getattr(
            opts, "dataset.multi_modal_img_text.trunc_seq_len", False):
        samples = out.get("samples")
        if isinstance(samples, dict) and "text" in samples:
            text = samples["text"]
            lengths = (np.asarray(text) != 0).astype(np.int32)
            # position after the last non-pad token, over all leading axes
            last = lengths * np.arange(1, text.shape[-1] + 1)
            max_len = int(last.max()) if last.size else 1
            bucket = max(16, ((max_len + 15) // 16) * 16)
            if bucket < text.shape[-1]:
                samples = dict(samples, text=text[..., :bucket])
                if "padding_mask" in samples and samples["padding_mask"] is not None:
                    samples["padding_mask"] = \
                        samples["padding_mask"][..., :bucket]
                out["samples"] = samples
    return out
