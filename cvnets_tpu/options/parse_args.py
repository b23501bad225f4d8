"""Typed argparse helpers (parity: reference options/parse_args.py)."""

from __future__ import annotations

import argparse
import json
from typing import Any, Dict, Type, Union

import typing


class JsonValidator:
    """argparse ``type=`` callable validating a JSON value against a typing hint.

    Usage: ``parser.add_argument("--x", type=JsonValidator(Dict[str, int]))``.
    Parity: reference options/parse_args.py:48.
    """

    def __init__(self, expected_type: Any) -> None:
        self.expected_type = expected_type

    def __repr__(self) -> str:
        return f"json::{self.expected_type}"

    def __call__(self, value: str) -> Any:
        try:
            parsed = json.loads(value)
        except json.JSONDecodeError:
            # Allow bare strings without quotes for convenience
            parsed = value
        if not self._check(parsed, self.expected_type):
            raise argparse.ArgumentTypeError(
                f"Value {value!r} does not match expected type {self.expected_type}"
            )
        return parsed

    @classmethod
    def _check(cls, value: Any, hint: Any) -> bool:
        if hint is Any:
            return True
        origin = typing.get_origin(hint)
        if origin is None:
            if hint is float:
                return isinstance(value, (int, float)) and not isinstance(value, bool)
            if hint is int:
                return isinstance(value, int) and not isinstance(value, bool)
            return isinstance(value, hint)
        args = typing.get_args(hint)
        if origin is Union:
            return any(cls._check(value, a) for a in args)
        if origin in (list, tuple):
            if not isinstance(value, list):
                return False
            if not args:
                return True
            if origin is tuple and len(args) == len(value) and Ellipsis not in args:
                return all(cls._check(v, a) for v, a in zip(value, args))
            elem = args[0]
            return all(cls._check(v, elem) for v in value)
        if origin is dict:
            if not isinstance(value, dict):
                return False
            if not args:
                return True
            kt, vt = args
            return all(
                cls._check(k, kt) and cls._check(v, vt) for k, v in value.items()
            )
        return isinstance(value, origin)


class ParseKwargs(argparse.Action):
    """Parses ``--common.override-kwargs k1=v1 k2=v2`` into a dict with YAML-ish
    scalar coercion (parity: reference options/opts.py:25-70)."""

    @staticmethod
    def _coerce(value: str) -> Any:
        lowered = value.lower()
        if lowered in ("true", "yes"):
            return True
        if lowered in ("false", "no"):
            return False
        if lowered in ("none", "null"):
            return None
        try:
            return int(value)
        except ValueError:
            pass
        try:
            return float(value)
        except ValueError:
            pass
        if "," in value:
            return [ParseKwargs._coerce(v) for v in value.split(",") if v != ""]
        return value

    def __call__(self, parser, namespace, values, option_string=None):
        out: Dict[str, Any] = {}
        for item in values:
            if "=" not in item:
                raise argparse.ArgumentTypeError(
                    f"override-kwargs entries must look like key=value; got {item!r}"
                )
            k, v = item.split("=", 1)
            out[k.strip()] = self._coerce(v.strip())
        setattr(namespace, "override_args", out)
