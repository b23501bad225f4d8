"""Golden tests: device-tier augmentation ops vs PIL reference outputs.

The reference applies AutoAugment/RandAugment via torchvision, whose PIL
backend calls ImageOps/ImageEnhance (reference data/transforms/image_pil.py:508-744).
PIL is therefore the ground truth for the photometric op semantics; drift here
moves final top-1 by whole points (VERDICT r1, weak #8). Ops run on floats in
[0, 1]; outputs are compared against PIL uint8 results with a 1-2/255 rounding
tolerance (equalize/posterize/solarize/invert are LUT-exact).
"""

import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

import jax.numpy as jnp

from cvnets_tpu.ops import image_ops as O


def _fixed_image(seed=0, shape=(64, 48, 3)):
    u8 = np.random.default_rng(seed).integers(0, 256, shape, np.uint8)
    return u8, Image.fromarray(u8), jnp.asarray(u8.astype(np.float32) / 255.0)


def _maxdiff(ours_f, pil_img):
    ours = np.asarray(jnp.clip(ours_f, 0, 1) * 255.0)
    ref = np.asarray(pil_img, np.float32)
    return float(np.abs(ours - ref).max())


@pytest.mark.parametrize("seed,shape", [(0, (64, 48, 3)), (7, (33, 57, 3))])
def test_lut_ops_match_pil_exactly(seed, shape):
    _, pil, f = _fixed_image(seed, shape)
    assert _maxdiff(O.invert(f), ImageOps.invert(pil)) < 0.5
    assert _maxdiff(O.solarize(f, 128 / 255.0), ImageOps.solarize(pil, 128)) < 0.5
    for bits in (1, 2, 4, 6, 7):
        assert _maxdiff(O.posterize(f, bits), ImageOps.posterize(pil, bits)) < 0.5
    assert _maxdiff(O.equalize(f), ImageOps.equalize(pil)) < 0.5
    # autocontrast: PIL truncates the scaled value; allow 1 LSB
    assert _maxdiff(O.autocontrast(f), ImageOps.autocontrast(pil)) <= 1.0


def test_equalize_identity_on_degenerate_histogram():
    # PIL short-circuits to identity when a channel has <=1 nonzero bins
    flat = np.full((16, 16, 3), 7, np.uint8)
    pil = Image.fromarray(flat)
    f = jnp.asarray(flat.astype(np.float32) / 255.0)
    assert _maxdiff(O.equalize(f), ImageOps.equalize(pil)) < 0.5


def test_rotate_direction_matches_pil_ccw():
    # PIL/torchvision rotate with a positive angle is COUNTER-clockwise; at 90°
    # on a square image bilinear sampling hits exact grid points, so the result
    # must equal np.rot90(img, k=1) exactly
    u8, pil, f = _fixed_image(3, (32, 32, 3))
    ours = np.asarray(O.rotate(f, 90.0)) * 255.0
    assert np.abs(ours - np.rot90(u8, 1).astype(np.float32)).max() < 0.5
    ref = np.asarray(pil.rotate(90), np.float32)
    assert np.abs(ours - ref).max() < 0.5


def test_translate_integer_shift_exact():
    # integer-pixel translation must be an exact shift with fill at the edge
    _, _, f = _fixed_image(4, (16, 16, 3))
    out = np.asarray(O.translate_x(f, 3.0, fill=0.0))
    ref = np.asarray(f)
    assert np.allclose(out[:, :-3], ref[:, 3:], atol=1e-6)
    assert np.allclose(out[:, -3:], 0.0, atol=1e-6)


@pytest.mark.parametrize("factor", [0.1, 0.3, 0.9, 1.0, 1.7])
def test_enhance_ops_match_pil(factor):
    _, pil, f = _fixed_image()
    # blend + uint8 rounding differences: allow ~2 LSB
    assert _maxdiff(O.adjust_brightness(f, factor),
                    ImageEnhance.Brightness(pil).enhance(factor)) <= 2.0
    assert _maxdiff(O.adjust_contrast(f, factor),
                    ImageEnhance.Contrast(pil).enhance(factor)) <= 2.0
    assert _maxdiff(O.adjust_saturation(f, factor),
                    ImageEnhance.Color(pil).enhance(factor)) <= 2.0
    # sharpness: PIL filters with float accumulation then rounds once; interior
    # and border (restored from input) must both match to ~2 LSB
    assert _maxdiff(O.adjust_sharpness(f, factor),
                    ImageEnhance.Sharpness(pil).enhance(factor)) <= 2.0
