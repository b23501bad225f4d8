"""Transform base + composition (parity: reference data/transforms/common.py:28)."""

from __future__ import annotations

import argparse
from typing import Dict, List


class BaseTransformation:
    """Per-sample op over a ``{"image", "box_coordinates", "mask", ...}`` dict."""

    def __init__(self, opts, *args, **kwargs) -> None:
        self.opts = opts

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        return parser

    def __call__(self, data: Dict) -> Dict:
        raise NotImplementedError

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}()"


class Compose(BaseTransformation):
    def __init__(self, opts, img_transforms: List[BaseTransformation]) -> None:
        super().__init__(opts)
        self.img_transforms = img_transforms

    def __call__(self, data: Dict) -> Dict:
        for t in self.img_transforms:
            data = t(data)
        return data

    def __repr__(self) -> str:
        inner = ", ".join(repr(t) for t in self.img_transforms)
        return f"Compose([{inner}])"
