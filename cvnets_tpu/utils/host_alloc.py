"""Host allocator tuning for the data path.

glibc serves allocations above M_MMAP_THRESHOLD (128 KB default) with fresh
``mmap`` regions and returns them to the OS on free. Every loader batch buffer
(tens of MB) then pays first-touch page faults on every allocation — on
virtualized hosts with slow fault paths (firecracker/UFFD-backed memory this
was measured at ~85 ms/MB, i.e. ~2 s per 25 MB batch) that dwarfs the actual
decode work. Routing large allocations through the sbrk heap keeps the pages
mapped across alloc/free cycles, so steady-state loader buffers hit warm
memory (~7 GB/s measured on the same host).

The reference has no analog (torch's DataLoader reuses pinned buffers through
its own caching allocator); this is the equivalent for a numpy/ctypes host
pipeline. Call once per process before the data path starts; it is idempotent
and a silent no-op where glibc/mallopt is unavailable (musl, non-Linux).
"""

from __future__ import annotations

import ctypes

_DONE = False

# glibc mallopt parameter codes (malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_MMAP_MAX = -4


def tune_host_allocator() -> bool:
    """Keep large allocations on the reusable heap; True when applied."""
    global _DONE
    if _DONE:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = (libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30) == 1
              and libc.mallopt(_M_MMAP_MAX, 0) == 1
              and libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30) == 1)
    except Exception:
        return False
    _DONE = bool(ok)
    return _DONE
