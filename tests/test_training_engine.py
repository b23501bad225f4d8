"""End-to-end training smoke test: real Trainer, dummy dataset, 8-device CPU mesh
(mirrors reference tests/test_training_engine.py:128-206, plus the multi-device
coverage the reference lacks)."""

import os

import pytest

import tests.dummy_datasets.classification  # noqa: F401 — registers dataset


def _opts(tmp_path, extra=None):
    from cvnets_tpu.options.opts import get_training_arguments

    args = [
        "--dataset.name", "dummy_classification",
        "--dataset.category", "classification",
        "--dataset.train-batch-size0", "2",
        "--dataset.val-batch-size0", "2",
        "--dataset.workers", "0",
        "--model.classification.name", "mobilenetv2",
        "--model.classification.n-classes", "10",
        "--sampler.name", "batch_sampler",
        "--sampler.bs.crop-size-width", "32",
        "--sampler.bs.crop-size-height", "32",
        "--loss.category", "classification",
        "--loss.classification.name", "cross_entropy",
        "--optim.name", "sgd",
        "--scheduler.name", "cosine",
        "--scheduler.max-epochs", "2",
        "--common.log-freq", "2",
        "--common.results-loc", str(tmp_path),
    ] + (extra or [])
    return get_training_arguments(args=args)


def test_trainer_two_epochs(tmp_path):
    from cvnets_tpu.data.data_loaders import create_train_val_loader
    from cvnets_tpu.engine import Trainer
    from cvnets_tpu.loss import build_loss_fn
    from cvnets_tpu.models import get_model

    opts = _opts(tmp_path)
    setattr(opts, "scheduler.cosine.max_lr", 0.05)
    setattr(opts, "scheduler.cosine.min_lr", 0.005)
    train_loader, val_loader, train_sampler = create_train_val_loader(opts)
    model = get_model(opts)
    criteria = build_loss_fn(opts)
    trainer = Trainer(
        opts=opts, model=model, criteria=criteria,
        train_loader=train_loader, val_loader=val_loader,
        train_sampler=train_sampler,
    )
    trainer.run()
    assert trainer.train_iterations > 0
    # checkpoints written
    ckpts = os.listdir(trainer.save_dir)
    assert any(c.startswith("training_checkpoint_last") for c in ckpts), ckpts
    assert any(c.startswith("checkpoint_best") for c in ckpts), ckpts


def test_trainer_resume(tmp_path):
    from cvnets_tpu.data.data_loaders import create_train_val_loader
    from cvnets_tpu.engine import Trainer
    from cvnets_tpu.loss import build_loss_fn
    from cvnets_tpu.models import get_model

    opts = _opts(tmp_path, extra=["--common.auto-resume", "--ema.enable"])
    setattr(opts, "scheduler.cosine.max_lr", 0.05)
    setattr(opts, "scheduler.cosine.min_lr", 0.005)

    def build():
        train_loader, val_loader, train_sampler = create_train_val_loader(opts)
        model = get_model(opts)
        criteria = build_loss_fn(opts)
        return Trainer(opts=opts, model=model, criteria=criteria,
                       train_loader=train_loader, val_loader=val_loader,
                       train_sampler=train_sampler)

    t1 = build()
    t1.run()
    iters_first = t1.train_iterations
    t2 = build()
    assert t2.start_epoch >= 2  # resumed past the first run's epochs
    assert t2.train_iterations == iters_first
