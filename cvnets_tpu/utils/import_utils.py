"""Recursive module auto-import so registry decorators execute.

Parity target: reference utils/import_utils.py:14 (import_modules_from_folder). The
registry pattern requires that every module containing an ``@REGISTRY.register(...)``
decorator is imported before the registry is read; this walks a package directory and
imports every python module beneath it.
"""

from __future__ import annotations

import importlib
import os
from typing import Sequence

from cvnets_tpu.utils import logger

# repo root containing the cvnets_tpu package
LIBRARY_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def import_modules_from_folder(folder_name: str, extra_roots: Sequence[str] = ()) -> None:
    """Import all python modules under ``cvnets_tpu/<folder_name>`` recursively.

    Args:
        folder_name: path relative to the package root, e.g. "models/classification".
        extra_roots: additional root globs (unused in the public build; kept for
            contract parity with the reference signature).
    """
    for root in ("cvnets_tpu",) + tuple(extra_roots):
        base_dir = os.path.join(LIBRARY_ROOT, root, folder_name)
        if not os.path.isdir(base_dir):
            if root == "cvnets_tpu":
                logger.error(
                    f"{base_dir} doesn't exist. Please check the path passed to"
                    " import_modules_from_folder."
                )
            continue
        for dirpath, _dirnames, filenames in sorted(os.walk(base_dir)):
            for fname in sorted(filenames):
                if not fname.endswith(".py") or fname.startswith("_"):
                    continue
                if fname.endswith("_test.py") or fname.startswith("test_"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, fname), LIBRARY_ROOT)
                module = rel[: -len(".py")].replace(os.sep, ".")
                importlib.import_module(module)
