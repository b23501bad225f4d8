"""Pytest config: force an 8-virtual-device CPU mesh so sharding/mesh code paths are
exercised without TPU hardware (SURVEY.md §4 — the reference tests everything on CPU;
we add multi-device coverage via xla_force_host_platform_device_count)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    # the suite is compile-bound on the 1-core CI host; backend opt level 0
    # skips XLA:CPU's expensive fusion/layout passes (measured: -41% on the
    # seg builds, -32% on the Pallas interpret file, all tests still green —
    # numerics are governed by jax_default_matmul_precision below, not by
    # HLO pass depth)
    + " --xla_backend_optimization_level=0"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# XLA:CPU lowers f32 convs/matmuls through low-precision fast paths by default
# (measured 3e-3..6e-3 abs error vs torch on this AMX host) — every parity
# tolerance in the suite assumes true f32, so pin it
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: the suite is compile-bound on the 1-core CI
# host; repeated runs (and re-runs after edits that don't touch a program)
# hit the cache instead of re-lowering every model
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            "/tmp/cvnets_tpu_jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _registry_isolation():
    """Snapshot/restore every process-global Registry per test module
    (VERDICT r4 #5: registry state mutated by one test module leaked into
    later ones). pytest imports ALL collected test modules before running any
    test, so module-level register decorators are already in the baseline
    snapshot; only registrations made while a module's tests RUN are rolled
    back here."""
    from cvnets_tpu.utils.registry import load_all_registries

    snaps = [(r, r.snapshot()) for r in load_all_registries()]
    yield
    for r, s in snaps:
        r.restore(s)


def pytest_collection_modifyitems(config, items):
    """TEST_ORDER=reverse reverses the FILE order (intra-module order kept —
    module fixtures still enter/exit once per module). Used to prove the
    suite has no test-module order coupling."""
    if os.environ.get("TEST_ORDER") != "reverse":
        return
    groups, order = {}, []
    for item in items:
        key = item.fspath
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(item)
    items[:] = [it for key in reversed(order) for it in groups[key]]
