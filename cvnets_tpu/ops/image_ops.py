"""Batched photometric/geometric augmentation ops running on device under jit.

This is the TPU-tier of the augmentation chain (BASELINE north star): the reference
applies RandAugment/AutoAugment/RandomErasing per sample with PIL on CPU workers
(reference data/transforms/image_pil.py:508-744, 1694); here whole batches are
augmented on the accelerator in fused XLA ops, removing host CPU from the hot path.

All ops take images as float32/bf16 NHWC in [0, 1] and are shape-static. Geometric
ops (rotate/shear/translate) build inverse affine grids and bilinearly sample via
gather — vmapped over the batch.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------- helpers


def _blend(a: jnp.ndarray, b: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(b + factor * (a - b), 0.0, 1.0)


def _grayscale(img: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    g = jnp.tensordot(img, w, axes=[[-1], [0]])
    return jnp.repeat(g[..., None], 3, axis=-1)


# --------------------------------------------------- photometric (whole batch)


def adjust_brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def adjust_contrast(img, factor):
    mean = jnp.mean(_grayscale(img), axis=(-3, -2, -1), keepdims=True)
    return _blend(img, mean, factor)


def adjust_saturation(img, factor):
    return _blend(img, _grayscale(img), factor)


def adjust_sharpness(img, factor):
    """3×3 smoothing blend (PIL SMOOTH kernel). PIL's filter leaves the 1-pixel
    image border untouched, so the border is restored from the input before
    blending (golden-tested against ImageEnhance.Sharpness)."""
    kernel = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], img.dtype) / 13.0
    blurred = jax.lax.conv_general_dilated(
        img[None] if img.ndim == 3 else img,
        jnp.tile(kernel[:, :, None, None], (1, 1, 1, img.shape[-1])),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=img.shape[-1],
    )
    if img.ndim == 3:
        blurred = blurred[0]
    h, w = img.shape[-3], img.shape[-2]
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    interior = ((row > 0) & (row < h - 1) & (col > 0) & (col < w - 1))[..., None]
    blurred = jnp.where(interior, blurred, img)
    return _blend(img, blurred, factor)


def posterize(img, bits):
    # PIL/torchvision semantics: keep the top `bits` bits of the 8-bit value
    # (v >> (8-bits)) << (8-bits) — NOT rounding to a uniform grid
    q = 2.0 ** (8 - bits)
    v = jnp.clip(img * 255.0, 0.0, 255.0)
    return jnp.floor(v / q) * q / 255.0


def solarize(img, threshold):
    return jnp.where(img >= threshold, 1.0 - img, img)


def invert(img):
    return 1.0 - img


def autocontrast(img):
    lo = jnp.min(img, axis=(-3, -2), keepdims=True)
    hi = jnp.max(img, axis=(-3, -2), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / jnp.maximum(hi - lo, 1e-6), 1.0)
    return jnp.clip((img - lo) * scale, 0.0, 1.0)


def equalize(img):
    """Per-channel histogram equalization on a single HWC image (vmap for batch).

    Bit-exact float re-statement of PIL ImageOps.equalize's integer LUT:
    ``step = (npixels - hist[last_nonzero]) // 255``,
    ``lut[i] = (step//2 + cumsum(hist[:i])) // step`` (identity when step == 0).
    Histogram counts are small integers, so float64-free floor arithmetic in
    float32 is exact (golden-tested against PIL)."""
    def eq_channel(ch):
        v = jnp.clip(jnp.round(ch * 255.0), 0, 255).astype(jnp.int32)
        hist = jnp.zeros((256,), jnp.float32).at[v.reshape(-1)].add(1.0)
        nonzero = hist > 0
        last_nz = jnp.max(jnp.where(nonzero, jnp.arange(256), 0))
        step = jnp.floor((jnp.sum(hist) - hist[last_nz]) / 255.0)
        cum_excl = jnp.cumsum(hist) - hist
        lut = jnp.floor((jnp.floor(step / 2.0) + cum_excl)
                        / jnp.maximum(step, 1.0))
        lut = jnp.clip(lut, 0.0, 255.0)
        identity = jnp.arange(256, dtype=jnp.float32)
        # identity when step == 0 or when <=1 nonzero bins (PIL short-circuits)
        n_nonzero = jnp.sum(nonzero.astype(jnp.int32))
        use_identity = (step <= 0) | (n_nonzero <= 1)
        lut = jnp.where(use_identity, identity, lut)
        out = jnp.take(lut, v) / 255.0
        return out.astype(ch.dtype)

    return jnp.stack([eq_channel(img[..., c]) for c in range(img.shape[-1])], axis=-1)


# ------------------------------------------------------- geometric (per image)


def _affine_sample(img: jnp.ndarray, matrix: jnp.ndarray,
                   fill: float = 0.5) -> jnp.ndarray:
    """Bilinear sample an HWC image with inverse affine ``matrix`` (2×3),
    coordinates centered at the image center."""
    h, w, c = img.shape
    ys = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xs = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    src_x = matrix[0, 0] * xx + matrix[0, 1] * yy + matrix[0, 2] + (w - 1) / 2.0
    src_y = matrix[1, 0] * xx + matrix[1, 1] * yy + matrix[1, 2] + (h - 1) / 2.0

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = img[yi, xi]
        return jnp.where(valid[..., None], vals, jnp.asarray(fill, img.dtype))

    out = ((1 - wx) * (1 - wy))[..., None] * gather(y0, x0) \
        + (wx * (1 - wy))[..., None] * gather(y0, x0 + 1) \
        + ((1 - wx) * wy)[..., None] * gather(y0 + 1, x0) \
        + (wx * wy)[..., None] * gather(y0 + 1, x0 + 1)
    return out.astype(img.dtype)


def rotate(img, degrees, fill: float = 0.5):
    rad = degrees * math.pi / 180.0
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    m = jnp.array([[cos, -sin, 0.0], [sin, cos, 0.0]])
    return _affine_sample(img, m, fill)


def shear_x(img, mag, fill: float = 0.5):
    m = jnp.array([[1.0, mag, 0.0], [0.0, 1.0, 0.0]])
    return _affine_sample(img, m, fill)


def shear_y(img, mag, fill: float = 0.5):
    m = jnp.array([[1.0, 0.0, 0.0], [mag, 1.0, 0.0]])
    return _affine_sample(img, m, fill)


def translate_x(img, pixels, fill: float = 0.5):
    m = jnp.array([[1.0, 0.0, pixels], [0.0, 1.0, 0.0]])
    return _affine_sample(img, m, fill)


def translate_y(img, pixels, fill: float = 0.5):
    m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, pixels]])
    return _affine_sample(img, m, fill)


# ------------------------------------------------------------- RandAugment

# op table: (name, per-image fn(img, magnitude_fraction, signed))
# magnitude mapping follows torchvision RandAugment (the reference wraps
# torchvision's implementation, image_pil.py:575)


def _randaug_apply(img: jnp.ndarray, op_idx: jnp.ndarray, mag: jnp.ndarray,
                   sign: jnp.ndarray) -> jnp.ndarray:
    h, w, _ = img.shape
    signed = jnp.where(sign > 0.5, mag, -mag)
    branches = [
        lambda im: im,                                                # identity
        lambda im: shear_x(im, signed * 0.3),
        lambda im: shear_y(im, signed * 0.3),
        lambda im: translate_x(im, signed * 150.0 / 331.0 * w),
        lambda im: translate_y(im, signed * 150.0 / 331.0 * h),
        lambda im: rotate(im, signed * 30.0),
        lambda im: adjust_brightness(im, 1.0 + signed * 0.9),
        lambda im: adjust_saturation(im, 1.0 + signed * 0.9),
        lambda im: adjust_contrast(im, 1.0 + signed * 0.9),
        lambda im: adjust_sharpness(im, 1.0 + signed * 0.9),
        lambda im: posterize(im, 8.0 - mag * 4.0),
        lambda im: solarize(im, 1.0 - mag),
        lambda im: autocontrast(im),
        lambda im: equalize(im),
    ]
    return jax.lax.switch(op_idx, branches, img)


def rand_augment(rng: jax.Array, images: jnp.ndarray, num_ops: int = 2,
                 magnitude: int = 9, num_magnitude_bins: int = 31) -> jnp.ndarray:
    """Batched RandAugment: each image draws ``num_ops`` random ops at the given
    magnitude. Parity: torchvision RandAugment via reference image_pil.py:575."""
    n = images.shape[0]
    mag_frac = magnitude / (num_magnitude_bins - 1)

    def per_image(img, key):
        def body(i, carry):
            img, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            op_idx = jax.random.randint(k1, (), 0, 14)
            sign = jax.random.uniform(k2)
            img = _randaug_apply(img, op_idx, jnp.float32(mag_frac), sign)
            return (img, key)

        img, _ = jax.lax.fori_loop(0, num_ops, body, (img, key))
        return img

    keys = jax.random.split(rng, n)
    return jax.vmap(per_image)(images, keys)


def trivial_augment_wide(rng: jax.Array, images: jnp.ndarray,
                         num_magnitude_bins: int = 31) -> jnp.ndarray:
    """Batched TrivialAugmentWide: one random op at a random magnitude
    (parity: reference image_pil.py:664)."""
    n = images.shape[0]

    def per_image(img, key):
        k1, k2, k3 = jax.random.split(key, 3)
        op_idx = jax.random.randint(k1, (), 0, 14)
        mag = jax.random.uniform(k2)
        sign = jax.random.uniform(k3)
        return _randaug_apply(img, op_idx, mag, sign)

    keys = jax.random.split(rng, n)
    return jax.vmap(per_image)(images, keys)


def random_erasing(rng: jax.Array, images: jnp.ndarray, p: float = 0.25,
                   scale: Tuple[float, float] = (0.02, 0.33),
                   ratio: Tuple[float, float] = (0.3, 3.3)) -> jnp.ndarray:
    """Batched RandomErasing with per-image random boxes filled with noise
    (parity: reference image_pil.py:1694 wrapping torchvision)."""
    n, h, w, c = images.shape

    def per_image(img, key):
        k_apply, k_area, k_ratio, k_pos, k_noise = jax.random.split(key, 5)
        area = h * w * jax.random.uniform(k_area, minval=scale[0], maxval=scale[1])
        log_ratio = jax.random.uniform(
            k_ratio, minval=math.log(ratio[0]), maxval=math.log(ratio[1])
        )
        r = jnp.exp(log_ratio)
        eh = jnp.clip(jnp.sqrt(area * r), 1, h - 1).astype(jnp.int32)
        ew = jnp.clip(jnp.sqrt(area / r), 1, w - 1).astype(jnp.int32)
        top = jax.random.randint(k_pos, (), 0, h)
        left = jax.random.randint(jax.random.fold_in(k_pos, 1), (), 0, w)
        rows = jnp.arange(h)[:, None]
        cols = jnp.arange(w)[None, :]
        box = ((rows >= top) & (rows < top + eh)
               & (cols >= left) & (cols < left + ew))[..., None]
        noise = jax.random.normal(k_noise, img.shape, img.dtype)
        erased = jnp.where(box, noise, img)
        return jnp.where(jax.random.uniform(k_apply) < p, erased, img)

    keys = jax.random.split(rng, n)
    return jax.vmap(per_image)(images, keys)


# --------------------------------------------------------------- pipeline


def build_device_augmenter(opts) -> Optional[Callable]:
    """Compose the enabled device-tier augmentations into one fn(rng, images).

    Applied inside the jit'd train step before mixup/cutmix.
    """
    steps = []
    if getattr(opts, "image_augmentation.rand_augment.enable", False):
        # reference flag names win (image_pil.py rand_augment); n/m accepted
        m = getattr(opts, "image_augmentation.rand_augment.magnitude", None)
        if m is None:
            m = getattr(opts, "image_augmentation.rand_augment.m", None)
        m = 9 if m is None else int(m)
        n = getattr(opts, "image_augmentation.rand_augment.num_ops", None)
        if n is None:
            n = getattr(opts, "image_augmentation.rand_augment.n", None)
        n = 2 if n is None else int(n)
        bins = getattr(
            opts, "image_augmentation.rand_augment.num_magnitude_bins", None) or 31
        steps.append(lambda rng, x: rand_augment(
            rng, x, num_ops=n, magnitude=m, num_magnitude_bins=int(bins)))
    if getattr(opts, "image_augmentation.trivial_augment_wide.enable", False):
        steps.append(lambda rng, x: trivial_augment_wide(rng, x))
    if getattr(opts, "image_augmentation.random_erase.enable", False):
        p = getattr(opts, "image_augmentation.random_erase.p", 0.25) or 0.25
        steps.append(lambda rng, x: random_erasing(rng, x, p=p))
    if not steps:
        return None

    def augment(rng, images):
        for i, step in enumerate(steps):
            images = step(jax.random.fold_in(rng, i), images)
        return images

    return augment


def arguments_device_augmentation(parser):
    group = parser.add_argument_group(title="Device-tier augmentation")
    group.add_argument("--image-augmentation.rand-augment.enable",
                       action="store_true", default=False)
    group.add_argument("--image-augmentation.rand-augment.n", type=int, default=None)
    group.add_argument("--image-augmentation.rand-augment.m", type=int, default=None)
    group.add_argument("--image-augmentation.rand-augment.p", type=float, default=1.0)
    # reference flag names (image_pil.py:575 RandAugment)
    group.add_argument("--image-augmentation.rand-augment.num-ops", type=int,
                       default=None)
    group.add_argument("--image-augmentation.rand-augment.magnitude", type=int,
                       default=None)
    group.add_argument("--image-augmentation.rand-augment.num-magnitude-bins",
                       type=int, default=None)
    group.add_argument("--image-augmentation.rand-augment.interpolation",
                       type=str, default="bilinear",
                       help="Geometric-op resampling; the device tier "
                            "implements bilinear (the reference default)")
    group.add_argument("--image-augmentation.trivial-augment-wide.num-magnitude-bins",
                       type=int, default=None,
                       help="Config-compat (reference trivial_augment_wide)")
    group.add_argument("--image-augmentation.trivial-augment-wide.interpolation",
                       type=str, default="bilinear")
    group.add_argument("--image-augmentation.trivial-augment-wide.enable",
                       action="store_true", default=False)
    # auto-augment.enable and random-erase.* are registered by the host-tier
    # transforms (data/transforms/image_advanced.py); the device augmenter
    # implements random-erase batched when the flag is on, and the true PIL
    # AutoAugment policy runs host-side in the dataset pipeline.
    return parser
