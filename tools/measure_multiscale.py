"""Measure the multi-scale (h, w, bsz) executable-cache behavior on the TPU.

VERDICT r4 #3: the variable-batch sampler's (h, w, bsz)→cached-executable
design (data/sampler/variable_batch_sampler.py; reference semantics
data/sampler/variable_batch_sampler.py:18,243 + data/sampler/utils.py:13-67)
was CPU-tested only — the compile/cache behavior under a real epoch of scale
changes had never been measured on hardware.

Protocol (MobileViT-recipe scales: crop 256, 160-320, 5 scales, check 32 —
reference config/classification/imagenet/mobilevit.yaml:31-41; model =
MobileViTv2-1.0, the flagship):

1. Build the REAL VariableBatchSampler and pull one epoch's (h, w, bsz)
   sequence (seeded shuffle, exactly what the Trainer would see).
2. One resident device batch per distinct shape (synthetic pixels; the H2D
   path is measured separately in PROFILE-loader.md — this isolates
   compile/cache behavior).
3. For each batch in the sequence, call ONE jitted train step. First call
   per shape compiles (timed = compile cost); later calls hit the
   executable cache. Per-call value readback so times are real.
4. Steady state: per-shape scan-8 rate after all compiles, compared against
   the same-protocol fixed-shape rate — plus the time-weighted epoch rate.

Prints one JSON line per phase; run on the chip:
    python tools/measure_multiscale.py [n_seq_steps]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_seq = int(sys.argv[1]) if len(sys.argv) > 1 else 60

    from bench import SCAN_STEPS, _enable_persistent_compile_cache, _model_opts

    _enable_persistent_compile_cache()

    import jax
    import jax.numpy as jnp

    from cvnets_tpu.data.sampler import build_sampler
    from cvnets_tpu.engine.train_state import create_train_state, make_train_step
    from cvnets_tpu.loss import build_loss_fn
    from cvnets_tpu.metrics.stats import Statistics
    from cvnets_tpu.models import get_model
    from cvnets_tpu.optim import build_optimizer
    from cvnets_tpu.parallel import create_mesh, replicated_sharding, shard_batch

    opts = _model_opts("mobilevit_v2")
    for k, v in {
        "sampler.name": "variable_batch_sampler",
        "sampler.vbs.crop_size_width": 256,
        "sampler.vbs.crop_size_height": 256,
        "sampler.vbs.max_n_scales": 5,
        "sampler.vbs.min_crop_size_width": 160,
        "sampler.vbs.max_crop_size_width": 320,
        "sampler.vbs.min_crop_size_height": 160,
        "sampler.vbs.max_crop_size_height": 320,
        "sampler.vbs.check_scale": 32,
        "dataset.train_batch_size0": 128,
    }.items():
        setattr(opts, k, v)

    # 1. the real sampler's epoch schedule
    sampler = build_sampler(opts, n_data_samples=128 * 400, is_training=True)
    sampler.set_epoch(0)
    shape_seq = []
    for batch_tuples in sampler:
        h, w, _idx = batch_tuples[0]
        shape_seq.append((h, w, len(batch_tuples)))
        if len(shape_seq) >= n_seq:
            break
    distinct = sorted(set(shape_seq))
    print(json.dumps({"phase": "schedule", "n_steps": len(shape_seq),
                      "distinct_shapes": [list(s) for s in distinct],
                      "pixel_budget": [int(h * w * b) for h, w, b in distinct]}),
          flush=True)

    # 2. model/step/state
    model = get_model(opts)
    criteria = build_loss_fn(opts)
    tx = build_optimizer(opts)
    rng = jax.random.PRNGKey(0)
    dummy = {"samples": np.zeros((2, 256, 256, 3), np.float32),
             "targets": np.zeros((2,), np.int32)}
    state = create_train_state(model, tx, rng, dummy, ema_enabled=True)
    mesh = create_mesh(opts)
    state = jax.device_put(state, replicated_sharding(mesh))

    metrics = Statistics(opts, ["loss"]).metrics
    step_raw = make_train_step(model, criteria, tx, opts, metrics)
    step = jax.jit(step_raw)  # no donation: state survives across shapes

    resident = {}
    dr = np.random.default_rng(0)
    for (h, w, b) in distinct:
        resident[(h, w, b)] = shard_batch(mesh, {
            "samples": dr.standard_normal((b, h, w, 3)).astype(np.float32),
            "targets": (np.arange(b) % 1000).astype(np.int32)})

    def readback(m):
        return float(np.asarray(jax.device_get(m["loss"]["loss"])).ravel()[0])

    # 3. walk the real schedule; time every call
    first_hit = {}
    cached_times = {s: [] for s in distinct}
    for i, s in enumerate(shape_seq):
        t0 = time.perf_counter()
        state, m = step(state, resident[s], 2e-3, rng)
        readback(m)
        dt = time.perf_counter() - t0
        if s not in first_hit:
            first_hit[s] = dt
        else:
            cached_times[s].append(dt)
    compile_total = sum(first_hit.values())
    per_shape = {
        f"{h}x{w}x{b}": {
            "first_call_s": round(first_hit[(h, w, b)], 2),
            "cached_call_ms": round(
                1e3 * float(np.median(cached_times[(h, w, b)])), 1)
            if cached_times[(h, w, b)] else None,
            "n_cached_calls": len(cached_times[(h, w, b)]),
        } for (h, w, b) in distinct}
    print(json.dumps({"phase": "walk", "n_compiles": len(first_hit),
                      "compile_total_s": round(compile_total, 1),
                      "per_shape": per_shape}), flush=True)

    # 4. steady state per shape via scan-8 (dispatch-free), vs fixed-shape
    def multi_step(state, batch, lr, rng):
        def body(s, _):
            s, m = step_raw(s, batch, lr, rng)
            return s, m["loss"]["loss"][0]
        return jax.lax.scan(body, state, None, length=SCAN_STEPS)

    scan_jit = jax.jit(multi_step)
    rates = {}
    epoch_time = 0.0
    epoch_imgs = 0
    counts = {s: 0 for s in distinct}
    for s in shape_seq:
        counts[s] += 1
    for (h, w, b) in distinct:
        batch = resident[(h, w, b)]
        st, mm = scan_jit(state, batch, 2e-3, rng)  # compile out of timing
        float(np.asarray(jax.device_get(mm)).ravel()[-1])
        # chain the state through each timed call: the axon relay serves
        # identical repeated executions from cache, which would fake the rate
        t0 = time.perf_counter()
        for _ in range(2):
            st, mm = scan_jit(st, batch, 2e-3, rng)
        float(np.asarray(jax.device_get(mm)).ravel()[-1])
        dt = time.perf_counter() - t0
        rate = b * SCAN_STEPS * 2 / dt
        rates[f"{h}x{w}x{b}"] = round(rate, 1)
        n = counts[(h, w, b)]
        epoch_time += n * (b / rate)
        epoch_imgs += n * b
    steady_epoch_rate = epoch_imgs / epoch_time
    print(json.dumps({"phase": "steady", "per_shape_imgs_per_s": rates,
                      "schedule_weighted_imgs_per_s":
                          round(steady_epoch_rate, 1)}), flush=True)

    # fixed-shape comparison point (same protocol, 256x256x128)
    fixed = resident.get((256, 256, 128))
    if fixed is None:
        fixed = shard_batch(mesh, {
            "samples": dr.standard_normal((128, 256, 256, 3)).astype(np.float32),
            "targets": (np.arange(128) % 1000).astype(np.int32)})
    st, mm = scan_jit(state, fixed, 2e-3, rng)  # warm + de-dup vs relay cache
    float(np.asarray(jax.device_get(mm)).ravel()[-1])
    t0 = time.perf_counter()
    for _ in range(2):
        st, mm = scan_jit(st, fixed, 2e-3, rng)
    float(np.asarray(jax.device_get(mm)).ravel()[-1])
    fixed_rate = 128 * SCAN_STEPS * 2 / (time.perf_counter() - t0)
    print(json.dumps({
        "phase": "summary",
        "fixed_256_imgs_per_s": round(fixed_rate, 1),
        "multiscale_steady_imgs_per_s": round(steady_epoch_rate, 1),
        "ratio_vs_fixed": round(steady_epoch_rate / fixed_rate, 4),
        "n_compiles": len(first_hit),
        "compile_total_s": round(compile_total, 1),
        "amortized_over_imagenet_epoch_pct": round(
            100 * compile_total
            / (compile_total + 1_281_167 / steady_epoch_rate), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
