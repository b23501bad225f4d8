"""Small math helpers (parity: reference utils/math_utils.py:9-40)."""

from typing import Optional, Union


def make_divisible(
    v: Union[int, float], divisor: int = 8, min_value: Optional[int] = None
) -> int:
    """Round channel counts to a multiple of ``divisor`` without dropping >10%.

    The classic MobileNet rule; also keeps channel counts friendly to TPU lane
    tiling when divisor is 8/16.
    """
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return int(new_v)


def bound_fn(
    min_val: Union[int, float], max_val: Union[int, float], value: Union[int, float]
) -> Union[int, float]:
    return max(min_val, min(max_val, value))
