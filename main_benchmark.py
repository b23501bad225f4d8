"""Inference throughput microbenchmark (parity: reference main_benchmark.py:33-121:
warmup + timed loop with device sync; prints samples/sec)."""

from __future__ import annotations

import sys
import time
from typing import List, Optional

import numpy as np

from cvnets_tpu.models import get_model
from cvnets_tpu.options.opts import get_benchmarking_arguments
from cvnets_tpu.utils import logger
from cvnets_tpu.utils.common_utils import device_setup


def main_benchmark(args: Optional[List[str]] = None):
    import jax
    import jax.numpy as jnp

    opts = get_benchmarking_arguments(args=args)
    opts = device_setup(opts)
    batch_size = getattr(opts, "benchmark.batch_size", 1)
    warmup = getattr(opts, "benchmark.warmup_iter", 10)
    n_iter = getattr(opts, "benchmark.n_iter", 100)

    model = get_model(opts)
    dummy = model.dummy_input_and_label(batch_size)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, dummy["samples"],
                           training=False)

    fwd = jax.jit(lambda v, x: model.apply(v, x, training=False))
    x = dummy["samples"]

    out = None
    for _ in range(warmup):
        out = fwd(variables, x)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fwd(variables, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    samples_per_sec = batch_size * n_iter / dt
    logger.info(
        f"Inference: {samples_per_sec:.2f} samples/sec "
        f"(batch={batch_size}, {n_iter} iters, {dt:.3f}s)"
    )
    return samples_per_sec


if __name__ == "__main__":
    main_benchmark(sys.argv[1:])
