"""device_prefetch: the background H2D placement pipe between the loader and
the compiled step (cvnets_tpu/parallel/mesh.py). The reference hides H2D cost
inside torch DataLoader workers + pinned memory (reference
data/loader/dataloader.py:14-57); on TPU the equivalent is issuing
``jax.device_put`` ahead of consumption so the copy overlaps both host decode
and the device step (docs/perf/PROFILE-loader.md). These tests pin the
contract: order-preserving, exception-propagating, early-exit-safe."""

import threading
import time

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from cvnets_tpu.parallel import device_prefetch, shard_batch


@pytest.fixture(scope="module")
def mesh():
    n = min(8, len(jax.devices()))
    return Mesh(np.asarray(jax.devices()[:n]), ("data",))


def _batches(n, bs=8):
    for i in range(n):
        yield {"samples": np.full((bs, 4), i, np.float32),
               "targets": np.full((bs,), i, np.int64)}


def test_order_and_values(mesh):
    out = list(device_prefetch(_batches(7), mesh))
    assert len(out) == 7
    for i, (host, sharded) in enumerate(out):
        assert float(host["samples"][0, 0]) == i
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(sharded["samples"])),
            host["samples"])
        assert sharded["samples"].sharding.mesh.shape == mesh.shape


def test_matches_shard_batch(mesh):
    b = next(_batches(1))
    direct = shard_batch(mesh, b)
    (host, pre), = list(device_prefetch(iter([b]), mesh))
    np.testing.assert_array_equal(np.asarray(jax.device_get(pre["samples"])),
                                  np.asarray(jax.device_get(direct["samples"])))
    assert pre["samples"].sharding == direct["samples"].sharding


def test_source_exception_propagates(mesh):
    def gen():
        yield next(_batches(1))
        raise RuntimeError("decoder blew up")

    it = device_prefetch(gen(), mesh)
    next(it)
    with pytest.raises(RuntimeError, match="decoder blew up"):
        for _ in it:
            pass


def test_break_stops_worker(mesh):
    """Abandoning the generator mid-stream must stop the producer thread —
    the Trainer breaks out at max_iterations every epoch."""
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield {"samples": np.zeros((8, 4), np.float32)}

    before = threading.active_count()
    it = device_prefetch(gen(), mesh, depth=2)
    next(it)
    it.close()  # triggers the generator's finally: stop worker, drain queue
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    # the worker ran at most consumed + depth + in-flight item ahead
    assert len(produced) <= 1 + 2 + 2


def test_empty_source(mesh):
    assert list(device_prefetch(iter([]), mesh)) == []


def test_prefetch_runs_ahead(mesh):
    """The worker must pull batches before the consumer asks for them —
    that's the whole point (H2D overlaps the device step)."""
    pulled = threading.Event()

    def gen():
        yield {"samples": np.zeros((8, 4), np.float32)}
        pulled.set()
        yield {"samples": np.ones((8, 4), np.float32)}

    it = device_prefetch(gen(), mesh, depth=2)
    next(it)  # consume batch 0 only
    assert pulled.wait(timeout=5.0), "worker did not prefetch ahead"
    list(it)
