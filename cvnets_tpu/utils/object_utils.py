"""Dict/object introspection helpers (parity: reference utils/object_utils.py)."""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Union


def apply_recursively(obj: Any, fn: Callable, *args, **kwargs) -> Any:
    """Apply ``fn`` to every non-container leaf of nested dict/list/tuple."""
    if isinstance(obj, dict):
        return {k: apply_recursively(v, fn, *args, **kwargs) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        out = [apply_recursively(v, fn, *args, **kwargs) for v in obj]
        return type(obj)(out) if isinstance(obj, tuple) else out
    return fn(obj, *args, **kwargs)


def flatten_to_dict(obj: Any, name: str = "", sep: str = "/") -> Dict[str, Any]:
    """Flatten nested containers to {path: leaf}."""
    out: Dict[str, Any] = {}
    if isinstance(obj, dict):
        for k, v in obj.items():
            out.update(flatten_to_dict(v, f"{name}{sep}{k}" if name else str(k), sep))
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            out.update(flatten_to_dict(v, f"{name}{sep}{i}" if name else str(i), sep))
    else:
        out[name] = obj
    return out


def is_iterable(x: Any) -> bool:
    try:
        iter(x)
        return True
    except TypeError:
        return False
