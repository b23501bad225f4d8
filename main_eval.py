"""Evaluation entry point (parity: reference main_eval.py)."""

from __future__ import annotations

import sys
from typing import List, Optional

from cvnets_tpu.data.data_loaders import create_test_loader
from cvnets_tpu.engine import Evaluator
from cvnets_tpu.models import get_model
from cvnets_tpu.options.opts import get_eval_arguments
from cvnets_tpu.utils.checkpoint_utils import load_model_weights
from cvnets_tpu.utils.common_utils import device_setup


def main(opts, **kwargs):
    test_loader = create_test_loader(opts)
    model = get_model(opts)

    evaluator = Evaluator(opts=opts, model=model, test_loader=test_loader)
    pretrained = getattr(opts, "model.classification.pretrained", None) or getattr(
        opts, "common.resume", None
    )
    if pretrained:
        params, batch_stats = load_model_weights(
            pretrained, evaluator.state.params, evaluator.state.batch_stats
        )
        evaluator.state = evaluator.state.replace(
            params=params, batch_stats=batch_stats or {}
        )
    return evaluator.run()


def main_worker(args: Optional[List[str]] = None, **kwargs):
    opts = get_eval_arguments(args=args)
    opts = device_setup(opts)
    return main(opts, **kwargs)


def main_worker_segmentation(args: Optional[List[str]] = None, **kwargs):
    """Offline segmentation eval (reference main_eval.py:143)."""
    from cvnets_tpu.engine.eval_segmentation import main_segmentation_evaluation

    return main_segmentation_evaluation(args)


def main_worker_detection(args: Optional[List[str]] = None, **kwargs):
    """Offline detection eval (reference main_eval.py:149)."""
    from cvnets_tpu.engine.eval_detection import main_detection_evaluation

    return main_detection_evaluation(args)


if __name__ == "__main__":
    main_worker(sys.argv[1:])
