"""Training entry point (parity: reference main_train.py).

Single program, no process spawn: GSPMD shards the batch over the local mesh; on
multi-host pods, launch one copy per host (jax.distributed initializes from env).
"""

from __future__ import annotations

import sys
from typing import List, Optional

from cvnets_tpu.data.data_loaders import create_train_val_loader
from cvnets_tpu.engine import Trainer
from cvnets_tpu.loss import build_loss_fn
from cvnets_tpu.models import get_model
from cvnets_tpu.options.opts import get_training_arguments
from cvnets_tpu.utils import logger
from cvnets_tpu.utils.common_utils import device_setup


def main(opts, **kwargs):
    if getattr(opts, "common.int8_inference", False):
        logger.error(
            "--common.int8-inference is an inference-only flag (rounding has "
            "zero gradient); unset it for training and pass it to main_eval/"
            "main_benchmark instead.")
    train_loader, val_loader, train_sampler = create_train_val_loader(opts)
    model = get_model(opts)
    criteria = build_loss_fn(opts)

    trainer = Trainer(
        opts=opts,
        model=model,
        criteria=criteria,
        train_loader=train_loader,
        val_loader=val_loader,
        train_sampler=train_sampler,
    )
    trainer.run()
    return trainer


def main_worker(args: Optional[List[str]] = None, **kwargs):
    opts = get_training_arguments(args=args)
    opts = device_setup(opts)
    return main(opts, **kwargs)


if __name__ == "__main__":
    main_worker(sys.argv[1:])
