"""Native (C++) JPEG decode+crop+resize: correctness vs PIL, corrupt-sample
protocol, and the classification dataset fast path."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from cvnets_tpu import native


def _jpeg(arr, quality=90):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


pytestmark = pytest.mark.skipif(
    native.load_library() is None,
    reason="native decoder unavailable (no toolchain/libjpeg)")


def test_dimensions_probe():
    blob = _jpeg(np.zeros((120, 90, 3), np.uint8))
    assert native.jpeg_dimensions(blob) == (90, 120)
    assert native.jpeg_dimensions(b"junk") is None


def test_decode_matches_pil_on_natural_gradient():
    # smooth image: filter differences are tiny, geometry errors are not
    y, x = np.mgrid[0:400, 0:300]
    arr = np.stack([(x * 255 / 300), (y * 255 / 400),
                    ((x + y) * 255 / 700)], -1).astype(np.uint8)
    blob = _jpeg(arr, quality=95)
    out, ok = native.decode_crop_resize_batch([blob], None, (224, 224))
    assert ok[0]
    ref = np.asarray(Image.open(io.BytesIO(blob)).resize((224, 224),
                                                         Image.BILINEAR))
    assert np.abs(out[0].astype(int) - ref.astype(int)).mean() < 3.0


def test_crop_geometry():
    arr = np.zeros((200, 200, 3), np.uint8)
    arr[40:120, 60:140] = 255  # white rectangle
    blob = _jpeg(arr, quality=95)
    out, ok = native.decode_crop_resize_batch(
        [blob], [(60, 40, 80, 80)], (64, 64))
    assert ok[0]
    assert out[0].mean() > 240  # crop covers exactly the white region


def test_corrupt_sample_protocol():
    out, ok = native.decode_crop_resize_batch(
        [b"not a jpeg", _jpeg(np.zeros((64, 64, 3), np.uint8))], None, (32, 32))
    assert not ok[0] and ok[1]
    assert out[0].sum() == 0


def test_dataset_native_fast_path(tmp_path):
    import jax

    from cvnets_tpu.data.datasets.classification.base_image_classification_dataset import (  # noqa: E501
        BaseImageClassificationDataset,
    )
    from cvnets_tpu.options.opts import get_training_arguments

    root = tmp_path / "training"
    for ci, cls in enumerate(("a", "b")):
        d = root / cls
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(np.random.default_rng(ci * 10 + i).integers(
                0, 255, (300, 280, 3), np.uint8)).save(
                str(d / f"{i}.jpg"), quality=90)
    opts = get_training_arguments(args=[
        "--dataset.category", "classification",
        "--model.classification.name", "mobilenetv2",
        "--dataset.root-train", str(root),
        "--image-augmentation.random-resized-crop.enable",
    ])
    ds = BaseImageClassificationDataset(opts, is_training=True)
    # break the PIL path: the native path must carry the sample alone
    orig = BaseImageClassificationDataset.read_image_pil
    BaseImageClassificationDataset.read_image_pil = staticmethod(
        lambda p: (_ for _ in ()).throw(RuntimeError("PIL used")))
    try:
        out = ds[(224, 224, 0)]
    finally:
        BaseImageClassificationDataset.read_image_pil = orig
    assert out["samples"].shape == (224, 224, 3)
    assert out["samples"].dtype == np.float32
    assert 0.0 <= out["samples"].min() and out["samples"].max() <= 1.0


def test_loader_whole_batch_native_path(tmp_path):
    """decoder=native + RRC routes whole batches through ONE C++ call
    (dataset.fetch_batch_native): uint8 pixels, collated shape, corrupt-slot
    replacement, and no per-sample __getitem__ involvement."""
    from cvnets_tpu.data.data_loaders import create_train_val_loader
    from cvnets_tpu.options.opts import get_training_arguments

    root = tmp_path / "training"
    rng = np.random.default_rng(0)
    n_per, classes = 4, ("a", "b")
    for ci, cls in enumerate(classes):
        d = root / cls
        d.mkdir(parents=True)
        for i in range(n_per):
            Image.fromarray(rng.integers(0, 255, (96, 128, 3), np.uint8)).save(
                str(d / f"{i}.jpg"), quality=90)
    # one corrupt file exercises the repeat-a-valid-slot protocol
    (root / classes[0] / "bad.jpg").write_bytes(b"not a jpeg")
    opts = get_training_arguments(args=[
        "--dataset.category", "classification",
        "--dataset.name", "imagenet",
        "--model.classification.name", "mobilenetv2",
        "--dataset.root-train", str(root),
        "--dataset.root-val", str(root),
        "--dataset.decoder", "native",
        "--dataset.train-batch-size0", "4",
        "--dataset.workers", "1",
        "--sampler.name", "batch_sampler",
        "--sampler.bs.crop-size-width", "64",
        "--sampler.bs.crop-size-height", "64",
        "--image-augmentation.random-resized-crop.enable",
        "--image-augmentation.random-horizontal-flip.enable",
    ])
    train_loader, _, _ = create_train_val_loader(opts)
    ds = train_loader.dataset
    orig = type(ds).__getitem__
    type(ds).__getitem__ = (
        lambda self, t: (_ for _ in ()).throw(RuntimeError("per-sample path")))
    try:
        seen_ids = set()
        for batch in train_loader:
            assert batch["samples"].dtype == np.uint8
            assert batch["samples"].shape[1:] == (64, 64, 3)
            assert batch["targets"].dtype == np.int32
            assert (batch["targets"] >= 0).all()  # corrupt slot replaced
            seen_ids.update(batch["sample_id"].tolist())
    finally:
        type(ds).__getitem__ = orig
    assert len(seen_ids) >= 2 * n_per  # every healthy sample surfaced
