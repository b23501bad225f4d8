"""On-chip train-step benchmarks for the non-classification task families.

VERDICT r4 #1: BASELINE's config families 3-5 (detection, segmentation,
multimodal, byte-level) had correctness tests but zero on-chip numbers — the
TPU-specific machinery they exercise (in-pipeline SSD matching feeding the
static hard-negative multibox loss, ASPP + aux-head seg CE at 512², the
global-batch contrastive matmul, windowed attention + token merging over
real JPEG byte lengths) had never been timed. Each builder below constructs
the REAL config's model/loss/optimizer (from the same yaml a user trains
with) plus a host batch with the exact structure the data pipeline emits,
then reuses ``bench.measure_train_step``'s protocol (scan×N in one program,
value readback, cost-analysis roofline, MFU).

Reference anchors: SSD `cvnets/models/detection/ssd.py:29`, seg
`cvnets/models/segmentation/enc_dec.py:21`, CLIP
`cvnets/models/multi_modal_image_text/clip.py:27`, ByteFormer
`cvnets/models/classification/byteformer.py:49`.

Run all four:      python bench_tasks.py
Run one:           python bench_tasks.py ssd|deeplab|clip|byteformer
From bench.py:     one rotating family per round (budget-gated).
"""

from __future__ import annotations

import io
import json
import sys

import numpy as np


def _opts_from_config(path: str, overrides: dict):
    from cvnets_tpu.options.opts import get_training_arguments

    opts = get_training_arguments(args=["--common.config-file", path])
    for k, v in overrides.items():
        setattr(opts, k, v)
    return opts


def _build(opts):
    from cvnets_tpu.loss import build_loss_fn
    from cvnets_tpu.models import get_model
    from cvnets_tpu.optim import build_optimizer

    return get_model(opts), build_loss_fn(opts), build_optimizer(opts)


def _n_chips() -> int:
    import jax

    return jax.device_count()


# --------------------------------------------------------------------------
# SSDLite MobileViTv2-1.0 @ 320 COCO (config/detection/ssd_coco/mobilevit_v2.yaml)
# --------------------------------------------------------------------------

def bench_ssd(batch: int = 32, img: int = 320, iters: int = 16) -> dict:
    """The matching runs in the data pipeline (host, per sample —
    coco_ssd.py:__getitem__), so the device step consumes fixed-size
    per-anchor targets; what's timed here is the model + the static-shape
    hard-negative-mined multibox loss over all anchors."""
    from bench import measure_train_step
    from cvnets_tpu.models.anchor_generator import build_anchor_generator

    opts = _opts_from_config("config/detection/ssd_coco/mobilevit_v2.yaml", {
        "model.classification.mitv2.width_multiplier": 1.0,
        # single-chip bench: plain BN (sync-BN == BN at mesh size 1; the yaml
        # assumes an 8-GPU DDP world)
        "model.normalization.name": "batch_norm",
    })
    model, criteria, tx = _build(opts)

    # anchors exactly as the dataset generates them (coco_ssd.py:44-53)
    import math

    gen = build_anchor_generator(opts)
    anchors = []
    for os_ in gen.output_strides:
        fh = fw = 1 if os_ == -1 else 0
        if os_ != -1:
            fh = int(math.ceil(img / os_))
            fw = int(math.ceil(img / os_))
        anchors.append(gen(fh, fw, os_))
    n_anchors = int(np.concatenate(anchors, axis=0).shape[0])

    n = batch * _n_chips()
    rng = np.random.default_rng(0)
    # ~2% positive anchors per image (typical COCO matching density)
    labels = np.where(rng.random((n, n_anchors)) < 0.02,
                      rng.integers(1, 81, (n, n_anchors)), 0).astype(np.int32)
    batch_np = {
        "samples": rng.standard_normal((n, img, img, 3)).astype(np.float32),
        "targets": {
            "box_labels": labels,
            "box_coordinates": rng.standard_normal(
                (n, n_anchors, 4)).astype(np.float32),
        },
    }
    out = measure_train_step(
        opts, model, criteria, tx, batch_np,
        "ssdlite_mobilevit_v2_1.0_coco_train_images_per_sec_per_chip",
        iters=iters)
    out["n_anchors"] = n_anchors
    out["batch"] = batch
    return out


# --------------------------------------------------------------------------
# DeepLabv3 MobileViTv2-1.0 @ 512 ADE20k (config/segmentation/ade20k/...)
# --------------------------------------------------------------------------

def bench_deeplab(batch: int = 8, img: int = 512, iters: int = 16) -> dict:
    """ASPP head + aux head + ignore-index seg CE at the recipe's 512² crop.
    The yaml trains at bs4/GPU×8; one v5e chip takes bs8 comfortably (noted
    in the line)."""
    from bench import measure_train_step

    opts = _opts_from_config(
        "config/segmentation/ade20k/deeplabv3_mobilevitv2.yaml", {
            "model.normalization.name": "batch_norm",
        })
    model, criteria, tx = _build(opts)

    n = batch * _n_chips()
    rng = np.random.default_rng(0)
    masks = rng.integers(0, 150, (n, img, img)).astype(np.int32)
    masks = np.where(rng.random((n, img, img)) < 0.05, 255, masks)  # ignore px
    batch_np = {
        "samples": rng.standard_normal((n, img, img, 3)).astype(np.float32),
        "targets": masks,
    }
    out = measure_train_step(
        opts, model, criteria, tx, batch_np,
        "deeplabv3_mobilevit_v2_1.0_ade20k_train_images_per_sec_per_chip",
        iters=iters)
    out["batch"] = batch
    return out


# --------------------------------------------------------------------------
# CLIP ViT-B/16 @ 224 (config/multi_modal_image_text/clip_vit.yaml)
# --------------------------------------------------------------------------

def bench_clip(batch: int = 128, img: int = 224, iters: int = 16) -> dict:
    """Image tower (ViT-B/16) + text tower (12-layer, 512-dim, 49408 vocab)
    + global-batch InfoNCE. The reference's differentiable all_gather
    collapses into the GSPMD-sharded image·textᵀ matmul."""
    from bench import measure_train_step

    opts = _opts_from_config("config/multi_modal_image_text/clip_vit.yaml", {})
    model, criteria, tx = _build(opts)

    ctx = int(getattr(opts, "model.text.context_length", 77))
    vocab = int(getattr(opts, "model.text.vocab_size", 49408))
    n = batch * _n_chips()
    rng = np.random.default_rng(0)
    batch_np = {
        "samples": {
            "image": rng.standard_normal((n, img, img, 3)).astype(np.float32),
            "text": rng.integers(1, vocab - 1, (n, ctx)).astype(np.int32),
        },
        "targets": np.arange(n, dtype=np.int32),
    }
    out = measure_train_step(
        opts, model, criteria, tx, batch_np,
        "clip_vit_b16_train_images_per_sec_per_chip", iters=iters)
    out["batch"] = batch
    return out


# --------------------------------------------------------------------------
# ByteFormer-Tiny ImageNet JPEG-q60 (config/classification/imagenet/byteformer.yaml)
# --------------------------------------------------------------------------

def _jpeg_byte_corpus(n: int, img: int = 224, quality: int = 60):
    """Real JPEG q60 byte streams from natural-image-like synthetic pixels
    (1/f spectrum: low-res noise upsampled + grain), so sequence lengths and
    byte statistics match what the collate feeds the model."""
    from PIL import Image

    rng = np.random.default_rng(0)
    seqs = []
    for _ in range(n):
        base = rng.integers(0, 256, (img // 16, img // 16, 3), np.uint8)
        im = Image.fromarray(base).resize((img, img), Image.BILINEAR)
        arr = np.asarray(im).astype(np.int16)
        arr = arr + rng.integers(-12, 13, arr.shape, np.int16)
        im = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))
        buf = io.BytesIO()
        im.save(buf, format="JPEG", quality=quality)
        seqs.append(np.frombuffer(buf.getvalue(), np.uint8).astype(np.int32))
    return seqs


def bench_byteformer(batch: int = 48, iters: int = 16) -> dict:
    """Byte embedding → strided conv token reduction → windowed transformer
    (+ shifts) → token merging, over REAL JPEG-q60 byte sequences padded to
    the collate's power-of-two bucket — the long-token path the recipe
    actually runs (max_num_tokens 50k; q60 224² crops land in the 8-16k
    bucket)."""
    from bench import measure_train_step
    from cvnets_tpu.data.collate.byteformer_collate_functions import _pad_batch

    opts = _opts_from_config("config/classification/imagenet/byteformer.yaml",
                             {})
    model, criteria, tx = _build(opts)

    n = batch * _n_chips()
    seqs = _jpeg_byte_corpus(n)
    samples = _pad_batch(seqs, opts)
    batch_np = {
        "samples": samples,
        "targets": (np.arange(n) % 1000).astype(np.int32),
    }
    out = measure_train_step(
        opts, model, criteria, tx, batch_np,
        "byteformer_tiny_jpeg_train_images_per_sec_per_chip", iters=iters)
    out["batch"] = batch
    out["seq_len"] = int(samples.shape[1])
    out["raw_len_mean"] = int(np.mean([len(s) for s in seqs]))
    return out


# --------------------------------------------------------------------------
# RangeAugment A/B: ResNet-50 + in-forward neural augmentor vs plain ResNet-50
# (examples/range_augment/classification/resnet_50.yaml; VERDICT r4 #4)
# --------------------------------------------------------------------------

def bench_rangeaugment(batch: int = 128, img: int = 224,
                       iters: int = 16) -> list:
    """The augmentor runs INSIDE the model forward on device (learnable
    brightness/contrast/noise on a random half of the batch, reference
    neural_aug.py:194-216) with the PSNR-curriculum penalty in a composite
    loss. Expected ~free next to the ResNet-50 step; this measures it."""
    from bench import measure_train_step

    def one(metric, with_aug: bool):
        overrides = {
            # fixed-shape A/B (the recipe's variable sampler is measured
            # separately in PROFILE-multiscale.md)
            "sampler.name": "batch_sampler",
            "sampler.bs.crop_size_width": img,
            "sampler.bs.crop_size_height": img,
        }
        if not with_aug:
            overrides.update({
                "model.learn_augmentation.brightness": False,
                "model.learn_augmentation.contrast": False,
                "model.learn_augmentation.noise": False,
                "model.learn_augmentation.mode": None,
                "loss.category": "classification",
                "loss.classification.name": "cross_entropy",
            })
        opts = _opts_from_config(
            "examples/range_augment/classification/resnet_50.yaml", overrides)
        model, criteria, tx = _build(opts)
        n = batch * _n_chips()
        rng = np.random.default_rng(0)
        batch_np = {
            "samples": rng.random((n, img, img, 3)).astype(np.float32),
            "targets": (np.arange(n) % 1000).astype(np.int32),
        }
        out = measure_train_step(opts, model, criteria, tx, batch_np, metric,
                                 iters=iters)
        out["batch"] = batch
        return out

    plain = one("resnet_50_plain_train_images_per_sec_per_chip", False)
    aug = one("resnet_50_rangeaugment_train_images_per_sec_per_chip", True)
    # vs_baseline for the A/B line = augmented rate / plain rate
    aug["vs_plain"] = (round(aug["value"] / plain["value"], 4)
                       if plain["value"] else 0.0)
    return [plain, aug]


TASKS = {
    "ssd": bench_ssd,
    "deeplab": bench_deeplab,
    "clip": bench_clip,
    "byteformer": bench_byteformer,
    "rangeaugment": bench_rangeaugment,
}


def main() -> None:
    from bench import _enable_persistent_compile_cache

    _enable_persistent_compile_cache()
    names = sys.argv[1:] or ["ssd", "deeplab", "clip", "byteformer"]
    for name in names:
        try:
            out = TASKS[name]()
            for line in (out if isinstance(out, list) else [out]):
                print(json.dumps(line), flush=True)
        except Exception as e:  # keep going; each family reports its own error
            print(json.dumps({"metric": f"task_{name}", "value": 0.0,
                              "unit": "images/sec/chip", "vs_baseline": 0.0,
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
