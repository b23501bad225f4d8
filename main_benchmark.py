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


def benchmark_data_pipeline(opts) -> float:
    """Host preprocess throughput: JPEG decode + train transforms + collate
    through the real loader stack (the 'preprocess imgs/sec' half of the
    BASELINE metric). Uses a synthetic ImageFolder of random JPEGs."""
    import os
    import tempfile

    from PIL import Image

    from cvnets_tpu.data.data_loaders import create_train_val_loader

    n = getattr(opts, "benchmark.data_pipeline_samples", 512)
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as root:
        for cls in range(4):
            d = os.path.join(root, f"class_{cls}")
            os.makedirs(d)
            for i in range(max(1, n // 4)):
                arr = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"),
                                          quality=85)
        setattr(opts, "dataset.name", "imagenet")
        setattr(opts, "dataset.category", "classification")
        setattr(opts, "dataset.root_train", root)
        setattr(opts, "dataset.root_val", root)
        if getattr(opts, "sampler.name", None) is None:
            setattr(opts, "sampler.name", "batch_sampler")
        train_loader, _, _ = create_train_val_loader(opts)

        # warm one pass (thread pool spin-up), then the timed pass
        for _ in train_loader:
            break
        seen = 0
        t0 = time.perf_counter()
        for batch in train_loader:
            leaf = batch["samples"]
            seen += int(np.shape(leaf)[0])
        dt = time.perf_counter() - t0
    imgs_per_sec = seen / dt
    logger.info(
        f"Preprocess: {imgs_per_sec:.1f} imgs/sec"
        f" ({seen} imgs decoded+transformed+collated in {dt:.2f}s)")
    return imgs_per_sec


def main_benchmark(args: Optional[List[str]] = None):
    import jax
    import jax.numpy as jnp

    opts = get_benchmarking_arguments(args=args)
    opts = device_setup(opts)
    if getattr(opts, "benchmark.data_pipeline", False):
        return benchmark_data_pipeline(opts)
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

    # chain the input (x depends on the previous output) so remote relays
    # cannot serve cached results, and force a VALUE readback at the end —
    # block_until_ready alone is acked optimistically over the axon relay
    def chained(v, x):
        out = fwd(v, x)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return out, x + (jnp.mean(leaf) * 0 + 1e-6).astype(x.dtype)

    out = None
    for _ in range(warmup):
        out, x = chained(variables, x)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0])

    t0 = time.perf_counter()
    for _ in range(n_iter):
        out, x = chained(variables, x)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0])
    dt = time.perf_counter() - t0

    samples_per_sec = batch_size * n_iter / dt
    logger.info(
        f"Inference: {samples_per_sec:.2f} samples/sec "
        f"(batch={batch_size}, {n_iter} iters, {dt:.3f}s)"
    )
    return samples_per_sec


if __name__ == "__main__":
    main_benchmark(sys.argv[1:])
