"""Offline segmentation evaluation (parity: reference
engine/eval_segmentation.py:435-498): predict masks, confusion-matrix mIoU,
optional colored/overlay PNG dumps via utils/visualization."""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from cvnets_tpu.utils import logger
from cvnets_tpu.utils.color_map import Colormap


def predict_and_save(opts, model, variables, image_np: np.ndarray,
                     out_dir: Optional[str] = None, fname: str = "pred"):
    """Single-image prediction; saves colored mask / overlay if requested
    (reference :41)."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(image_np)[None]
    logits = jax.jit(lambda v, x: model.apply(v, x, training=False))(variables, x)
    if isinstance(logits, dict):
        logits = logits["segmentation_output"]
    mask = np.asarray(jnp.argmax(logits[0], axis=-1), np.uint8)

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        from PIL import Image

        cmap = Colormap().get_color_map_list()
        pil = Image.fromarray(mask, mode="P")
        pil.putpalette(cmap)
        apply_cmap = getattr(
            opts, "evaluation.segmentation.apply_color_map", False)
        save_masks = getattr(opts, "evaluation.segmentation.save_masks", False)
        overlay_pred = getattr(
            opts, "evaluation.segmentation.save_overlay_rgb_pred", False)
        # with no explicit selection keep the colored mask (our legacy default;
        # the reference saves nothing unless a flag is set)
        if apply_cmap or not (save_masks or overlay_pred):
            pil.save(os.path.join(out_dir, f"{fname}_mask.png"))
        if save_masks:
            # raw label ids, no palette (reference draw_binary_masks :135)
            Image.fromarray(mask, mode="L").save(
                os.path.join(out_dir, f"{fname}_labels.png"))
        if overlay_pred:
            w = getattr(opts, "evaluation.segmentation.overlay_mask_weight", 0.5)
            rgb = (image_np * 255).astype(np.uint8)
            colored = np.asarray(pil.convert("RGB"))
            overlay = (rgb * (1 - w) + colored * w).astype(np.uint8)
            Image.fromarray(overlay).save(
                os.path.join(out_dir, f"{fname}_overlay.jpg"))
    return mask


def predict_labeled_dataset(opts, model, variables, loader) -> float:
    """Confusion-matrix mIoU over the validation set (reference :238 analog)."""
    import jax
    import jax.numpy as jnp

    n_classes = getattr(opts, "model.segmentation.n_classes", 21)
    ignore = 255
    conf = np.zeros((n_classes, n_classes), np.int64)

    @jax.jit
    def run(v, x):
        logits = model.apply(v, x, training=False)
        if isinstance(logits, dict):
            logits = logits["segmentation_output"]
        return jnp.argmax(logits, axis=-1)

    for batch in loader:
        pred = np.asarray(run(variables, jnp.asarray(batch["samples"])))
        target = np.asarray(batch["targets"])
        valid = target != ignore
        idx = n_classes * target[valid].astype(np.int64) + pred[valid]
        conf += np.bincount(idx, minlength=n_classes**2).reshape(n_classes,
                                                                 n_classes)
    inter = np.diag(conf)
    union = conf.sum(0) + conf.sum(1) - inter
    present = union > 0
    miou = float((inter[present] / union[present]).mean() * 100)
    logger.info(f"mIoU: {miou:.2f}")
    return miou


def main_segmentation_evaluation(args=None):
    from cvnets_tpu.data.data_loaders import create_test_loader
    from cvnets_tpu.models import get_model
    from cvnets_tpu.options.opts import get_eval_arguments
    from cvnets_tpu.utils.common_utils import device_setup

    import jax

    opts = get_eval_arguments(args=args)
    opts = device_setup(opts)
    mode = getattr(opts, "evaluation.segmentation.mode", "validation_set")

    model = get_model(opts)
    rng = jax.random.PRNGKey(0)
    dummy = model.dummy_input_and_label(1)
    variables = model.init({"params": rng, "dropout": rng}, dummy["samples"],
                           training=False)
    pretrained = getattr(opts, "model.segmentation.pretrained", None)
    if pretrained:
        from cvnets_tpu.utils.checkpoint_utils import load_model_weights

        params, bs = load_model_weights(pretrained, variables["params"],
                                        variables.get("batch_stats"))
        variables = dict(variables, params=params)
        if bs:
            variables["batch_stats"] = bs

    if mode == "validation_set":
        loader = create_test_loader(opts)
        return predict_labeled_dataset(opts, model, variables, loader)
    if mode in ("single_image", "image_folder"):
        # reference eval_segmentation.py:333-498 single-image/folder prediction
        # with colored-mask + overlay dumps
        res_dir = os.path.join(
            getattr(opts, "common.results_loc", "results"), "predictions")
        paths = _collect_image_paths(opts, mode, task="segmentation")
        size = _eval_size(opts)
        for path in paths:
            img = _load_image_f32(path, size)
            fname = os.path.splitext(os.path.basename(path))[0]
            predict_and_save(opts, model, variables, img, out_dir=res_dir,
                             fname=fname)
        logger.info(f"Saved {len(paths)} prediction(s) under {res_dir}")
        return res_dir
    raise NotImplementedError(f"evaluation.segmentation.mode={mode} pending")


def _eval_size(opts):
    fixed = getattr(
        opts, "evaluation.segmentation.resize_input_images_fixed_size", None)
    if fixed:
        if len(fixed) == 1:
            return (int(fixed[0]), int(fixed[0]))
        return (int(fixed[0]), int(fixed[1]))
    h = getattr(opts, "sampler.bs.crop_size_height", 512) or 512
    w = getattr(opts, "sampler.bs.crop_size_width", 512) or 512
    return (h, w)


def _load_image_f32(path: str, size_hw) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    img = img.resize((size_hw[1], size_hw[0]), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def _collect_image_paths(opts, mode: str, task: str):
    key = f"evaluation.{task}.path"
    path = getattr(opts, key, None)
    if path is None:
        logger.error(f"--{key.replace('_', '-').replace('.', '.')} required for"
                     f" {mode} mode")
    if mode == "single_image":
        return [path]
    exts = (".jpg", ".jpeg", ".png", ".bmp")
    return sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.lower().endswith(exts)
    )


if __name__ == "__main__":
    import sys

    main_segmentation_evaluation(sys.argv[1:])
