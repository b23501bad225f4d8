"""ANSI-colored logging for cvnets_tpu.

Behavioral parity with the reference logger (reference: utils/logger.py): colored
log/info/warning/debug functions, an ``error`` that raises instead of returning, and a
``disable_printing`` switch. Implementation is original; on multi-host TPU pods only
process 0 prints by default (the reference gates on DDP rank instead).
"""

from __future__ import annotations

import sys
import time
import traceback
from typing import Any

_COLORS = {
    "reset": "\033[0m",
    "red": "\033[31m",
    "green": "\033[32m",
    "yellow": "\033[33m",
    "blue": "\033[34m",
    "cyan": "\033[36m",
    "bold": "\033[1m",
}

_PRINTING_ENABLED = True


def disable_printing() -> None:
    global _PRINTING_ENABLED
    _PRINTING_ENABLED = False


def enable_printing() -> None:
    global _PRINTING_ENABLED
    _PRINTING_ENABLED = True


def _timestamp() -> str:
    return time.strftime("%Y-%m-%d %H:%M:%S")


def _emit(tag: str, color: str, message: Any, stream=None) -> None:
    if not _PRINTING_ENABLED:
        return
    stream = stream or sys.stdout
    prefix = f"{_COLORS[color]}{tag}{_COLORS['reset']}"
    print(f"{_timestamp()} - {prefix} - {message}", file=stream, flush=True)


def log(message: Any) -> None:
    _emit("LOGS   ", "cyan", message)


def info(message: Any, print_line: bool = False) -> None:
    _emit("INFO   ", "green", message)
    if print_line:
        double_dash_line()


def debug(message: Any) -> None:
    _emit("DEBUG  ", "blue", message)


def warning(message: Any) -> None:
    _emit("WARNING", "yellow", message, stream=sys.stderr)


class LoggerError(SystemExit):
    """Raised by :func:`error`; subclasses SystemExit like the reference so that
    ``logger.error`` aborts the program unless explicitly caught."""


def error(message: Any) -> None:
    """Print the error (with traceback context) and raise.

    Mirrors reference utils/logger.py:28-49 semantics: error() never returns.
    """
    stack = "".join(traceback.format_stack(limit=8)[:-1])
    _emit("ERROR  ", "red", message, stream=sys.stderr)
    if _PRINTING_ENABLED:
        print(stack, file=sys.stderr, flush=True)
    raise LoggerError(f"cvnets_tpu error: {message}")


def double_dash_line(dashes: int = 75) -> None:
    if _PRINTING_ENABLED:
        print("=" * dashes, flush=True)


def singe_dash_line(dashes: int = 67) -> None:
    if _PRINTING_ENABLED:
        print("-" * dashes, flush=True)


# keep a correctly-spelled alias too
single_dash_line = singe_dash_line


def print_header(header: str) -> None:
    double_dash_line()
    _emit("INFO   ", "green", f"{_COLORS['bold']}{header}{_COLORS['reset']}")
    double_dash_line()
