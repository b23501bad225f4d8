"""Device/seed setup (parity: reference utils/common_utils.py:20-148)."""

from __future__ import annotations

import os
import random
from typing import Any

import numpy as np

from cvnets_tpu.utils import logger


def device_setup(opts):
    """Seed python/numpy RNGs and record device info on opts.

    The reference also configures cudnn/TF32 (utils/common_utils.py:66-108); the XLA
    analog (deterministic compilation) needs no per-run switches.
    """
    from cvnets_tpu.utils.host_alloc import tune_host_allocator

    tune_host_allocator()

    seed = getattr(opts, "common.seed", 0) or 0
    random.seed(seed)
    np.random.seed(seed)

    import jax

    requested = getattr(opts, "dev.device", None)
    if requested:
        try:
            jax.config.update("jax_platforms", requested)
        except Exception as e:
            logger.warning(f"Could not select platform {requested}: {e}")
    devices = jax.devices()
    setattr(opts, "dev.device", jax.default_backend())
    setattr(opts, "dev.num_gpus", len(devices))  # name kept for config parity
    if jax.process_index() == 0:
        logger.info(f"Using {len(devices)} {jax.default_backend()} device(s)")
    return opts


def move_to_device(opts, x: Any, *args, **kwargs) -> Any:
    """Recursive host->device transfer (reference :122); under GSPMD prefer
    parallel.shard_batch which also shards the batch axis."""
    import jax

    return jax.tree_util.tree_map(lambda v: jax.device_put(v), x)


def create_directories(dir_path: str, is_master_node: bool) -> None:
    if is_master_node and not os.path.isdir(dir_path):
        os.makedirs(dir_path, exist_ok=True)
