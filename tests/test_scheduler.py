"""Scheduler numerics (mirrors reference tests/test_scheduler.py: per-iteration
LR computed from scratch; warmup boundaries; terminal values)."""

import math

import pytest


def _build(name, extra=None):
    from cvnets_tpu.optim.scheduler import build_scheduler
    from cvnets_tpu.options.opts import get_training_arguments

    args = ["--scheduler.name", name,
            "--scheduler.max-epochs", "100",
            "--scheduler.max-iterations", "1000"] + (extra or [])
    return build_scheduler(get_training_arguments(args=args))


def test_cosine_warmup_and_endpoints():
    s = _build("cosine", ["--scheduler.is-iteration-based",
                          "--scheduler.warmup-iterations", "10",
                          "--scheduler.warmup-init-lr", "1e-4"])
    setattr(s, "max_lr", 0.4)
    setattr(s, "min_lr", 0.04)
    assert s.retrieve_lr(0, 0) == pytest.approx(1e-4)
    # warmup is linear and reaches max_lr at its boundary
    mid = s.retrieve_lr(0, 5)
    assert 1e-4 < mid < 0.4
    assert s.retrieve_lr(0, 10) == pytest.approx(0.4, rel=1e-3)
    # cosine tail reaches min_lr
    assert s.retrieve_lr(0, 10**9) == pytest.approx(0.04, rel=1e-3)


def test_cosine_epoch_based_half_period():
    s = _build("cosine")
    s.is_iter_based = False
    s.period = 100
    s.max_lr, s.min_lr = 0.2, 0.0
    assert s.retrieve_lr(50, 10**6) == pytest.approx(0.1, rel=1e-6)


def test_polynomial_endpoints_and_power():
    s = _build("polynomial", ["--scheduler.is-iteration-based"])
    s.start_lr, s.end_lr, s.power = 0.5, 0.01, 2.0
    s.max_iterations = 1000
    assert s.retrieve_lr(0, 0) == pytest.approx(0.5)
    assert s.retrieve_lr(0, 1000) == pytest.approx(0.01)
    expect = (0.5 - 0.01) * (1 - 0.5) ** 2.0 + 0.01
    assert s.retrieve_lr(0, 500) == pytest.approx(expect, rel=1e-6)


def test_multi_step_drops_at_milestones():
    s = _build("multi_step")
    s.lr, s.gamma, s.milestones = 0.1, 0.1, [30, 60]
    assert s.retrieve_lr(0, 100) == pytest.approx(0.1)
    assert s.retrieve_lr(30, 100) == pytest.approx(0.01)
    assert s.retrieve_lr(60, 100) == pytest.approx(0.001)


def test_cyclic_triangle():
    s = _build("cyclic")
    s.min_lr, s.max_lr, s.cycle_steps = 0.1, 0.5, 100
    s.warmup_iterations = 0
    assert s.retrieve_lr(0, 0) == pytest.approx(0.1)
    assert s.retrieve_lr(0, 50) == pytest.approx(0.5)
    assert s.retrieve_lr(0, 100) == pytest.approx(0.1)
    assert s.retrieve_lr(0, 25) == pytest.approx(0.3)


def test_fixed_constant():
    s = _build("fixed", ["--scheduler.fixed.lr", "0.02"])
    assert s.retrieve_lr(0, 0) == pytest.approx(0.02)
    assert s.retrieve_lr(7, 12345) == pytest.approx(0.02)


def test_fixed_requires_lr():
    from cvnets_tpu.utils.logger import LoggerError

    with pytest.raises((LoggerError, SystemExit)):
        _build("fixed")


def test_unknown_scheduler_rejected():
    from cvnets_tpu.utils.logger import LoggerError

    with pytest.raises((LoggerError, SystemExit)):
        _build("bogus_scheduler")


def test_adjust_period_for_epochs_matches_reference():
    """Epoch-based cosine/polynomial with warmup: LR trajectory equals the
    reference scheduler's when --scheduler.adjust-period-for-epochs is set
    (reference optim/scheduler/{cosine.py:71-78, polynomial.py:73-75})."""
    import sys

    sys.path.insert(0, "tests")
    from reference_interop import REFERENCE_ROOT, reference_available

    if not reference_available():
        pytest.skip("reference checkout unavailable")
    if REFERENCE_ROOT not in sys.path:
        # append, not insert(0): the reference tree has top-level main_train.py
        # / config/ / options/ modules that would shadow the repo's for the
        # rest of the pytest session (matches reference_interop.py).
        sys.path.append(REFERENCE_ROOT)
    from optim.scheduler.cosine import CosineScheduler as RefCosine
    from optim.scheduler.polynomial import PolynomialScheduler as RefPoly

    from cvnets_tpu.optim.scheduler import build_scheduler
    from cvnets_tpu.options.opts import get_training_arguments

    iters_per_epoch = 7
    for name, ref_cls in (("cosine", RefCosine), ("polynomial", RefPoly)):
        opts = get_training_arguments(args=[
            "--scheduler.name", name,
            "--scheduler.max-epochs", "20",
            "--scheduler.warmup-iterations", "20",  # ~3 epochs of warmup
            "--scheduler.warmup-init-lr", "1e-6",
            "--scheduler.adjust-period-for-epochs",
            "--scheduler.cosine.max-lr", "0.4",
            "--scheduler.cosine.min-lr", "0.01",
            "--scheduler.polynomial.start-lr", "0.4",
            "--scheduler.polynomial.end-lr", "0.01",
        ])
        setattr(opts, "scheduler.is_iteration_based", False)
        ours = build_scheduler(opts)
        ref = ref_cls(opts)
        it = 0
        for epoch in range(20):
            for _ in range(iters_per_epoch):
                got = ours.get_lr(epoch, it)
                want = ref.get_lr(epoch=epoch, curr_iter=it)
                assert got == pytest.approx(want, abs=1e-12), (
                    name, epoch, it, got, want)
                it += 1
