"""Model registry + builder (parity: reference cvnets/models/__init__.py and
cvnets/__init__.py:21 modeling_arguments)."""

from __future__ import annotations

import argparse
from typing import Optional

from cvnets_tpu.models.base_model import BaseAnyNNModel
from cvnets_tpu.utils import logger
from cvnets_tpu.utils.registry import Registry

MODEL_REGISTRY = Registry(
    registry_name="model_registry",
    base_class=BaseAnyNNModel,
    lazy_load_dirs=["models"],
)


def get_model(
    opts,
    category: Optional[str] = None,
    model_name: Optional[str] = None,
    *args,
    **kwargs,
) -> BaseAnyNNModel:
    """Build the task model selected by ``dataset.category`` / ``model.<cat>.name``."""
    if category is None:
        category = getattr(opts, "dataset.category")
    if model_name is None:
        model_name = getattr(opts, f"model.{category}.name")
    if model_name == "__base__":
        logger.error(f"For {category} task, model name can't be __base__.")
    # reference freeze_norm_layers (base_model.py:140, called from enc_dec/
    # base_detection/clip): norm layers pinned to running stats + no param
    # updates. The internal model.normalization.frozen flag makes the norm
    # factory emit FrozenBatchNorm and build_optimizer zero norm updates.
    if getattr(opts, f"model.{category}.freeze_batch_norm", False):
        setattr(opts, "model.normalization.frozen", True)
        logger.info(f"Normalization layers are frozen ({category})")
    model = MODEL_REGISTRY[model_name, category].build_model(opts, *args, **kwargs)
    return model


def arguments_model(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    parser = BaseAnyNNModel.add_arguments(parser)
    parser = MODEL_REGISTRY.all_arguments(parser)
    return parser


def modeling_arguments(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    from cvnets_tpu.layers import layer_specific_arguments
    from cvnets_tpu.misc.averaging_utils import arguments_ema
    from cvnets_tpu.models.anchor_generator import arguments_anchor_gen
    from cvnets_tpu.models.matcher_det import arguments_box_matcher
    from cvnets_tpu.models.neural_augmentor import arguments_neural_augmentor
    from cvnets_tpu.models.multi_modal.text_encoders import arguments_text_encoder
    from cvnets_tpu.models.multi_modal.image_projection import (
        arguments_image_projection_head,
    )
    from cvnets_tpu.options.utils import extend_selected_args_with_prefix

    parser = arguments_text_encoder(parser)
    parser = arguments_image_projection_head(parser)
    parser = arguments_model(parser)
    parser = layer_specific_arguments(parser)
    parser = arguments_ema(parser)
    parser = arguments_anchor_gen(parser)
    parser = arguments_box_matcher(parser)
    parser = arguments_neural_augmentor(parser)
    # teacher.* clones for distillation — keep last
    parser = extend_selected_args_with_prefix(
        parser, match_prefix="--model.", additional_prefix="--teacher.model."
    )
    return parser
