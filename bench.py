"""Throughput benchmark for the driver: MobileViTv2-1.0 ImageNet-style train step.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` = roofline_lower_bound_time / measured_step_time, where the lower
bound is max(flops/peak_flops, bytes/peak_bw) from XLA cost analysis. The
MobileViTv2 train step is HBM-bandwidth-bound on v5e (depthwise convs have low
arithmetic intensity), so the binding roof is bandwidth. Values near (or slightly
above) 1.0 mean the step runs at the memory roofline — XLA's bytes-accessed count
slightly overestimates true HBM traffic where accesses stay in VMEM. The
BASELINE.json north star is ≥0.9 of roofline for this model on v5e.
"""

from __future__ import annotations

import json
import time

import numpy as np

BATCH = 128
IMG = 256
WARMUP = 5
ITERS = 30

# per-chip peak dense bf16 FLOPs/sec and HBM bandwidth (bytes/sec)
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
    "cpu": 1e11,
}
PEAK_BW = {
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,
    "cpu": 5e10,
}


def main() -> None:
    import jax

    from __graft_entry__ import _flagship_opts
    from cvnets_tpu.engine.train_state import create_train_state, make_train_step
    from cvnets_tpu.loss import build_loss_fn
    from cvnets_tpu.metrics.stats import Statistics
    from cvnets_tpu.models import get_model
    from cvnets_tpu.optim import build_optimizer
    from cvnets_tpu.parallel import create_mesh, replicated_sharding, shard_batch

    opts = _flagship_opts()
    model = get_model(opts)
    criteria = build_loss_fn(opts)
    tx = build_optimizer(opts)
    rng = jax.random.PRNGKey(0)
    dummy = {
        "samples": np.zeros((2, IMG, IMG, 3), np.float32),
        "targets": np.zeros((2,), np.int32),
    }
    state = create_train_state(model, tx, rng, dummy, ema_enabled=True)
    mesh = create_mesh(opts)
    state = jax.device_put(state, replicated_sharding(mesh))
    n_chips = len(mesh.devices.flatten())

    metrics = Statistics(opts, ["loss"]).metrics
    step_fn = make_train_step(model, criteria, tx, opts, metrics)

    # scan SCAN_STEPS train steps inside one program: measures pure device
    # throughput without per-call host dispatch over slow links
    SCAN_STEPS = 8

    def multi_step(state, batch, lr, rng):
        def body(s, _):
            s, m = step_fn(s, batch, lr, rng)
            return s, m["loss"]["loss"][0]
        return jax.lax.scan(body, state, None, length=SCAN_STEPS)

    step = jax.jit(multi_step, donate_argnums=(0,))

    batch_np = {
        "samples": np.random.default_rng(0)
        .standard_normal((BATCH * n_chips, IMG, IMG, 3)).astype(np.float32),
        "targets": (np.arange(BATCH * n_chips) % 1000).astype(np.int32),
    }
    batch = shard_batch(mesh, batch_np)

    # cost analysis for roofline. NOTE: XLA counts a while/scan BODY once, so the
    # reported numbers already correspond to ONE train step.
    flops_per_step = bytes_per_step = None
    try:
        lowered = step.lower(state, batch, 2e-3, rng)
        cost = lowered.compile().cost_analysis()
        if cost and "flops" in cost:
            flops_per_step = float(cost["flops"])
        if cost and "bytes accessed" in cost:
            bytes_per_step = float(cost["bytes accessed"])
    except Exception:
        pass

    state, m = step(state, batch, 2e-3, rng)
    # force a VALUE readback: block_until_ready can be acknowledged optimistically
    # by remote runtimes; converting a loss to a python float cannot
    float(np.asarray(jax.device_get(m)).ravel()[-1])

    n_calls = max(1, ITERS // SCAN_STEPS)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, m = step(state, batch, 2e-3, rng)
    float(np.asarray(jax.device_get(m)).ravel()[-1])
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * n_chips * SCAN_STEPS * n_calls / dt
    imgs_per_sec_chip = imgs_per_sec / n_chips

    dev_kind = jax.devices()[0].device_kind
    peak = peak_bw = None
    for key in PEAK_FLOPS:
        if key.lower() in dev_kind.lower() or dev_kind.lower() in key.lower():
            peak = PEAK_FLOPS[key]
            peak_bw = PEAK_BW[key]
            break
    if peak is None:
        on_tpu = jax.default_backend() == "tpu"
        peak = 197e12 if on_tpu else 1e11
        peak_bw = 819e9 if on_tpu else 5e10

    # roofline: a step can go no faster than max(compute, memory) lower bound.
    # MobileViTv2's depthwise convs make the train step memory-bound on v5e,
    # so the binding roof is HBM bandwidth, not MXU flops.
    vs_baseline = 0.0
    if flops_per_step:
        lb_time = flops_per_step / peak
        if bytes_per_step:
            lb_time = max(lb_time, bytes_per_step / peak_bw)
        step_time = dt / (SCAN_STEPS * n_calls)
        vs_baseline = lb_time / step_time

    print(json.dumps({
        "metric": "mobilevit_v2_1.0_train_images_per_sec_per_chip",
        "value": round(imgs_per_sec_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
