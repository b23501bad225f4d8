"""Remote-path resolution with local caching (parity: reference
utils/download_utils_base.py:18-77 — URL → /tmp cache with a
process-0-downloads-others-wait barrier on multi-host)."""

from __future__ import annotations

import os
import time
import urllib.request

from cvnets_tpu.constants import TMP_CACHE_LOC
from cvnets_tpu.utils import logger


def get_local_path(opts, path: str, cache_loc: str = TMP_CACHE_LOC,
                   max_wait_s: float = 600.0) -> str:
    """Return a local path for ``path``; download URLs into the cache.

    Multi-host: only process 0 downloads; others poll for the finished marker
    (reference rank-0 barrier protocol)."""
    if not isinstance(path, str) or not path.startswith(("http://", "https://")):
        return path
    os.makedirs(cache_loc, exist_ok=True)
    fname = os.path.join(cache_loc, path.split("/")[-1])
    marker = fname + ".done"
    if os.path.isfile(fname) and os.path.isfile(marker):
        return fname

    try:
        import jax

        is_lead = jax.process_index() == 0
    except Exception:
        is_lead = True

    if is_lead:
        logger.info(f"Downloading {path} -> {fname}")
        urllib.request.urlretrieve(path, fname)
        with open(marker, "w") as f:
            f.write("ok")
    else:
        waited = 0.0
        while not os.path.isfile(marker) and waited < max_wait_s:
            time.sleep(1.0)
            waited += 1.0
        if not os.path.isfile(marker):
            logger.error(f"Timed out waiting for {fname}")
    return fname
