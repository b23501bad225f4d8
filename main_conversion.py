"""Model export entry point (reference main_conversion.py:19 converts to CoreML
via utils/pytorch_to_coreml.py:20; the TPU-native equivalent exports the jitted
forward as a StableHLO/jax.export artifact).

Pipeline:
1. build the model from the config; load ``model.<category>.pretrained``
   weights (orbax tree or a torch ``.pt`` routed through the converter);
2. for re-parameterizable families (MobileOne/FastViT), fold the training-time
   branches into deploy form when ``--conversion.reparameterize`` is set
   (reference ``get_exportable_model``);
3. ``jax.export.export`` the inference forward at the config's crop size,
   writing both the serialized artifact (reloadable with
   ``jax.export.deserialize``) and the human-readable StableHLO MLIR;
4. assertion check: run the round-tripped artifact against the live model on a
   random batch and report max |diff| (reference pytorch_to_coreml.py:97).
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional

from cvnets_tpu.models import get_model
from cvnets_tpu.options.opts import get_conversion_arguments
from cvnets_tpu.utils import logger
from cvnets_tpu.utils.common_utils import device_setup


def _load_pretrained(opts, model, variables):
    category = getattr(opts, "dataset.category", "classification")
    pretrained = getattr(opts, f"model.{category}.pretrained", None) or getattr(
        opts, "common.finetune", None)
    if not pretrained:
        return variables
    from cvnets_tpu.utils.checkpoint_utils import load_model_weights

    params, bs = load_model_weights(pretrained, variables["params"],
                                    variables.get("batch_stats"), opts=opts)
    variables = dict(variables, params=params)
    if bs:
        variables["batch_stats"] = bs
    logger.info(f"Loaded pretrained weights from {pretrained}")
    return variables


def main_worker_conversion(args: Optional[List[str]] = None):
    import jax
    import numpy as np

    opts = get_conversion_arguments(args=args)
    opts = device_setup(opts)

    reparam = getattr(opts, "conversion.reparameterize", False)
    if reparam:
        # build the deploy-form (merged-branch) architecture; fold the trained
        # branch weights into it below
        category = getattr(opts, "dataset.category", "classification")
        name = getattr(opts, f"model.{category}.name", "")
        setattr(opts, f"model.classification.{name}.inference_mode", True)

    model = get_model(opts)
    rng = jax.random.PRNGKey(0)
    dummy = model.dummy_input_and_label(1)
    variables = model.init({"params": rng, "dropout": rng}, dummy["samples"],
                           training=False)

    if reparam:
        # init the TRAINING architecture to receive the checkpoint, then fold
        train_opts = get_conversion_arguments(args=args)
        category = getattr(train_opts, "dataset.category", "classification")
        train_model = get_model(train_opts)
        train_vars = train_model.init({"params": rng, "dropout": rng},
                                      dummy["samples"], training=False)
        train_vars = _load_pretrained(opts, train_model, train_vars)
        from cvnets_tpu.utils.reparam_utils import get_exportable_params

        folded = get_exportable_params(train_vars["params"],
                                       train_vars.get("batch_stats", {}))
        variables = {"params": folded}
        logger.info("Folded re-parameterizable branches into deploy form")
    else:
        variables = _load_pretrained(opts, model, variables)

    def fwd(v, x):
        out = model.apply(v, x, training=False)
        return out["logits"] if isinstance(out, dict) and "logits" in out else out

    from jax import export as jax_export

    exported = jax_export.export(jax.jit(fwd))(variables, dummy["samples"])

    results_loc = getattr(opts, "common.results_loc", "results")
    run_label = getattr(opts, "common.run_label", "run_1")
    out_dir = os.path.join(results_loc, run_label)
    os.makedirs(out_dir, exist_ok=True)
    mlir_path = os.path.join(out_dir, "model_stablehlo.mlir")
    with open(mlir_path, "w") as f:
        f.write(exported.mlir_module())
    bin_path = os.path.join(out_dir, "model_stablehlo.bin")
    with open(bin_path, "wb") as f:
        f.write(exported.serialize())
    logger.info(f"Exported StableHLO module to {mlir_path} (+ serialized {bin_path})")

    # assertion check (reference utils/pytorch_to_coreml.py:97): the serialized
    # artifact must reproduce the live model — on the user-supplied image when
    # --conversion.input-image-path is given (reference :36), else on a fresh
    # random batch
    img_path = getattr(opts, "conversion.input_image_path", None)
    x = None
    if img_path and os.path.isfile(img_path):
        from PIL import Image

        shape = dummy["samples"].shape
        pil = Image.open(img_path).convert("RGB").resize(
            (shape[2], shape[1]))
        x = np.broadcast_to(
            np.asarray(pil, np.float32)[None] / 255.0, shape).copy()
        logger.info(f"Assertion check uses image {img_path}")
    if x is None:
        x = np.random.default_rng(0).standard_normal(
            dummy["samples"].shape).astype(np.float32)
    with open(bin_path, "rb") as f:
        reloaded = jax_export.deserialize(f.read())
    got = np.asarray(reloaded.call(variables, x))
    # compare against the COMPILED forward: on TPU the eager path takes
    # different fusion/precision decisions (default matmul precision is
    # bf16-ish), which is numerics noise, not an export bug
    want = np.asarray(jax.jit(fwd)(variables, x))
    abs_diff = float(np.max(np.abs(got - want)))
    denom = float(np.max(np.abs(want))) or 1.0
    rel = abs_diff / denom
    logger.info(
        f"Assertion check: max |exported - live| = {abs_diff:.3e} (rel {rel:.3e})")
    if rel > 1e-2:
        logger.error(f"Exported model diverges from the live model: rel {rel}")
    return mlir_path


if __name__ == "__main__":
    main_worker_conversion(sys.argv[1:])
