"""Framework-wide constants (parity: reference common/__init__.py:9-39)."""

import os
from typing import Any, Callable

MIN_TORCH_VERSION = None  # torch not required; kept for doc parity

SUPPORTED_IMAGE_EXTNS = [".png", ".jpg", ".jpeg"]
SUPPORTED_VIDEO_CLIP_VOTING_FN = ["sum", "max"]
SUPPORTED_VIDEO_READER = ["pyav", "decord"]

DEFAULT_IMAGE_WIDTH = DEFAULT_IMAGE_HEIGHT = 256
DEFAULT_IMAGE_CHANNELS = 3
DEFAULT_VIDEO_FRAMES = 8
DEFAULT_LOG_FREQ = 500

DEFAULT_ITERATIONS = 300000
DEFAULT_EPOCHS = 300
DEFAULT_MAX_ITERATIONS = DEFAULT_MAX_EPOCHS = 10000000

TMP_RES_FOLDER = "results_tmp"
TMP_CACHE_LOC = "/tmp/cvnets_tpu"

Norm_Layer_Default = "batch_norm"


def is_test_env() -> bool:
    """True when running under pytest (reference common/__init__.py:34)."""
    return "PYTEST_CURRENT_TEST" in os.environ


def if_test_env(then: Any, otherwise: Any) -> Any:
    """Pick a smaller value under pytest (reference common/__init__.py:37-39)."""
    return then if is_test_env() else otherwise
