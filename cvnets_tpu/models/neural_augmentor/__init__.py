"""RangeAugment neural augmentor arguments (parity: reference
cvnets/neural_augmentor/__init__.py). The augmentor module lives in
neural_aug.py and is wired into BaseImageEncoder's forward during training."""

from __future__ import annotations

import argparse


def arguments_neural_augmentor(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Neural augmentor (RangeAugment)")
    group.add_argument("--model.learn-augmentation.mode", type=str, default=None,
                       choices=[None, "basic", "distribution"])
    group.add_argument("--model.learn-augmentation.brightness", action="store_true")
    group.add_argument("--model.learn-augmentation.contrast", action="store_true")
    group.add_argument("--model.learn-augmentation.noise", action="store_true")
    group.add_argument("--model.learn-augmentation.lr-multiplier", type=float, default=1.0)
    return parser
