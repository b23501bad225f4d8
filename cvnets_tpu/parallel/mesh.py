"""Mesh construction and batch sharding helpers."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(opts=None, devices: Optional[Sequence] = None) -> Mesh:
    """Build the device mesh from ``--dev.mesh-shape``/``--dev.mesh-axis-names``.

    Default: all devices on a single ``data`` axis (pure DP — the only parallelism the
    reference has, SURVEY.md §2.8). A second ``model`` axis enables TP/SP layouts for
    models that opt in.
    """
    if devices is None:
        devices = jax.devices()
        if opts is not None:
            n = getattr(opts, "dev.num_devices", -1) or -1
            if n > 0:
                devices = devices[:n]
    shape = getattr(opts, "dev.mesh_shape", None) if opts is not None else None
    axis_names = getattr(opts, "dev.mesh_axis_names", None) if opts is not None else None
    if not shape:
        shape = [len(devices)]
    if not axis_names:
        axis_names = [DATA_AXIS, MODEL_AXIS][: len(shape)]
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


# The mesh the engine is currently training over. Layers that embed mesh-aware
# collectives (ring attention under --dev.sequence-parallel) read it at trace
# time; the Trainer / graft dryrun set it right after building the mesh. A
# plain module global (not a context var): one process drives one mesh.
_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def device_prefetch(iterable, mesh: Mesh, depth: int = 2):
    """Yield ``(host_batch, sharded_batch)`` pairs, issuing H2D placement up
    to ``depth`` batches ahead of consumption from a background thread.

    ``jax.device_put`` is asynchronous, but issuing it from the consume loop
    serializes the transfer behind the previous step's dispatch via queue
    backpressure; issuing early lets the H2D copy overlap both host decode
    and the device step (measured on the axon tunnel: the copy is the
    loader-fed bottleneck, docs/perf/PROFILE-loader.md). The host batch is
    yielded alongside for metadata (batch size, sample ids) — it is alive in
    the queue anyway. Source-iterator exceptions surface in the consumer;
    abandoning the generator (``break``) stops the worker thread.
    """
    import queue as _queue
    import threading as _threading

    q: "_queue.Queue" = _queue.Queue(maxsize=max(1, depth))
    stop = _threading.Event()
    sentinel = object()

    def worker():
        try:
            for b in iterable:
                item = (b, shard_batch(mesh, b))
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except _queue.Full:
                        continue
                if stop.is_set():
                    return
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.2)
                    return
                except _queue.Full:
                    continue
        except BaseException as e:  # surfaced at the consumer's next get
            q.put(e)

    t = _threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except _queue.Empty:
            pass


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place a host-local numpy batch onto the mesh, sharded along the batch axis.

    Single-host: a plain device_put with NamedSharding. Multi-host: each host holds
    its sampler shard; ``make_array_from_process_local_data`` assembles the global
    array (the sampler guarantees identical global shapes across hosts).
    """
    sharding = data_sharding(mesh)

    def _put(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return x
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(np.asarray(x), sharding)

    return jax.tree_util.tree_map(_put, batch)
