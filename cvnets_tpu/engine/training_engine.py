"""Trainer (parity: reference engine/training_engine.py:36-741).

The reference's per-iteration python work (autocast, backward, scaler, clip, step,
EMA, metric allreduce) is compiled into one XLA program (engine/train_state.py);
the Trainer's job shrinks to: drive the loader, compute the per-iteration LR
host-side (scheduler numerics identical to the reference), feed sharded batches,
accumulate metric (sum, count) pairs, checkpoint, and log.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cvnets_tpu.engine.train_state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from cvnets_tpu.layers.normalization import AdjustBatchNormMomentum
from cvnets_tpu.metrics.stats import Statistics
from cvnets_tpu.misc.averaging_utils import ema_update
from cvnets_tpu.ops.mixing import build_mixing_fn
from cvnets_tpu.optim import build_optimizer
from cvnets_tpu.optim.scheduler import build_scheduler
from cvnets_tpu.parallel import (
    create_mesh,
    device_prefetch,
    replicated_sharding,
    shard_batch,
)
from cvnets_tpu.parallel.mesh import set_active_mesh
from cvnets_tpu.utils import logger
from cvnets_tpu.utils.checkpoint_utils import CheckpointManager, load_checkpoint

DEFAULT_LOG_FREQ = 100


class Trainer:
    def __init__(
        self,
        opts,
        model,
        criteria,
        train_loader,
        val_loader=None,
        train_sampler=None,
        start_epoch: int = 0,
        start_iteration: int = 0,
        save_dir: Optional[str] = None,
    ) -> None:
        self.opts = opts
        self.model = model
        self.criteria = criteria
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.train_sampler = train_sampler

        self.is_master_node = jax.process_index() == 0
        self.mesh = create_mesh(opts)
        set_active_mesh(self.mesh)

        self.max_epochs = getattr(opts, "scheduler.max_epochs", 100) or 100
        self.max_iterations = getattr(opts, "scheduler.max_iterations", 10**9) or 10**9
        self.is_iteration_based = getattr(opts, "scheduler.is_iteration_based", False)
        if self.is_iteration_based:
            self.max_epochs = 10**7
        self.log_freq = getattr(opts, "common.log_freq", DEFAULT_LOG_FREQ)
        self.save_interval_freq = getattr(opts, "common.save_interval_freq", 0) or 0
        self.seed = getattr(opts, "common.seed", 0) or 0
        self.ema_enabled = getattr(opts, "ema.enable", False)
        self.ema_copy_at_epoch = getattr(opts, "ema.copy_at_epoch", -1)

        # sample-efficient training (reference training_engine.py:131-156, 458-570)
        def _set_cfg(key, default):
            # reference prefix is dataset.*; common.* kept as a fallback
            # (numeric dataset flags default to None so a common.* setattr wins)
            v = getattr(opts, f"dataset.sample_efficient_training.{key}", None)
            if v is None:
                v = getattr(opts, f"common.sample_efficient_training.{key}", None)
            return default if v is None else v

        self.set_enabled = bool(
            getattr(opts, "dataset.sample_efficient_training.enable", False)
            or getattr(opts, "common.sample_efficient_training.enable", False))
        self.set_confidence = _set_cfg("sample_confidence", 0.5)
        self.set_every_k = _set_cfg("find_easy_samples_every_k_epochs", 5)
        self.set_min_epochs = _set_cfg("min_sample_frequency", 5)
        self._easy_counts: Dict[int, int] = {}

        self.train_metric_names = getattr(opts, "stats.train", ["loss"])
        self.val_metric_names = getattr(opts, "stats.val", ["loss"])
        self.ckpt_metric_name = getattr(opts, "stats.checkpoint_metric", "loss")

        lr_mults = {}
        if hasattr(model, "get_lr_multipliers"):
            lr_mults = model.get_lr_multipliers(opts) or {}
        self.tx = build_optimizer(opts, lr_multipliers=lr_mults)
        self.scheduler = build_scheduler(opts)
        self.mixing_fn = build_mixing_fn(opts)
        from cvnets_tpu.ops.image_ops import build_device_augmenter

        self.augment_fn = build_device_augmenter(opts)

        # BN momentum annealing hook (reference training_engine.py:120-129)
        self._profile_state = None
        self.adjust_norm_mom = None
        if getattr(opts, "model.normalization.adjust_bn_momentum.enable", False):
            self.adjust_norm_mom = AdjustBatchNormMomentum(opts)

        # ---- build state from a dummy batch -------------------------------
        rng = jax.random.PRNGKey(self.seed)
        dummy = model.dummy_input_and_label(2)
        self.state = create_train_state(model, self.tx, rng, dummy,
                                        ema_enabled=self.ema_enabled)
        # placement: replicated by default; --dev.fsdp and/or a >1 'model' mesh
        # axis shard params + optimizer moments + EMA per parallel/sharding_rules
        self.fsdp = bool(getattr(opts, "dev.fsdp", False))
        self.state = self._place_state(self.state)
        self.rng = rng
        if self.is_master_node:
            from cvnets_tpu.models.base_model import count_parameters, forward_flops

            flops = forward_flops(
                model,
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats},
                dummy,
            )
            dummy_bs = int(np.shape(
                jax.tree_util.tree_leaves(dummy["samples"])[0])[0])
            per_sample = (f" | fwd GFLOPs/sample: {flops / dummy_bs / 1e9:.2f}"
                          if flops else "")
            logger.info(
                f"Model: {model.__class__.__name__} | params:"
                f" {count_parameters(self.state.params) / 1e6:.2f}M{per_sample} |"
                f" devices: {len(self.mesh.devices.flatten())}"
            )

        # ---- checkpointing -------------------------------------------------
        results_loc = getattr(opts, "common.results_loc", "results")
        run_label = getattr(opts, "common.run_label", "run_1")
        self.save_dir = save_dir or f"{results_loc}/{run_label}"
        self.ckpt_manager = CheckpointManager(opts, self.save_dir,
                                              self.is_master_node)
        if self.is_master_node:
            # store the resolved configuration with the run
            # (reference training_engine.py:579-587)
            import os

            import yaml

            os.makedirs(self.save_dir, exist_ok=True)
            with open(os.path.join(self.save_dir, "config.yaml"), "w") as f:
                yaml.safe_dump(
                    {k: v for k, v in sorted(vars(opts).items())
                     if isinstance(v, (str, int, float, bool, list, type(None)))},
                    f, default_flow_style=False)
        # finetune: model-only weights with scope surgery (reference
        # main_train.py:138-155 + cvnets/misc/common.py:54-109); .pt checkpoints
        # route through the torch converter
        finetune = getattr(opts, "common.finetune", None)
        if finetune:
            if finetune.endswith((".pt", ".pth")):
                from cvnets_tpu.utils.torch_checkpoint_converter import (
                    load_cvnets_checkpoint,
                )

                params, bs = load_cvnets_checkpoint(
                    opts, finetune, jax.device_get(self.state.params),
                    jax.device_get(self.state.batch_stats))
            else:
                from cvnets_tpu.utils.checkpoint_utils import load_model_weights

                params, bs = load_model_weights(
                    finetune, jax.device_get(self.state.params),
                    jax.device_get(self.state.batch_stats), opts=opts)
            self.state = self._place_state(self.state.replace(
                params=jax.device_get(params), batch_stats=bs or {}))
            logger.info(f"Loaded finetune weights from {finetune}")
            # optional separate EMA start point (reference
            # utils/checkpoint_utils.py:428-444)
            finetune_ema = getattr(opts, "common.finetune_ema", None)
            if finetune_ema and self.state.ema_params is not None:
                if finetune_ema.endswith((".pt", ".pth")):
                    from cvnets_tpu.utils.torch_checkpoint_converter import (
                        load_cvnets_checkpoint,
                    )

                    ema_params, _ = load_cvnets_checkpoint(
                        opts, finetune_ema, jax.device_get(self.state.params),
                        jax.device_get(self.state.batch_stats))
                else:
                    from cvnets_tpu.utils.checkpoint_utils import (
                        load_model_weights,
                    )

                    ema_params, _ = load_model_weights(
                        finetune_ema, jax.device_get(self.state.params),
                        None, opts=opts)
                self.state = self._place_state(
                    self.state.replace(ema_params=jax.device_get(ema_params)))
                logger.info(f"Loaded finetune EMA weights from {finetune_ema}")

        self.state, self.start_epoch, self.start_iteration, best = load_checkpoint(
            opts, self.state, self.save_dir
        )
        self.state = self._place_state(self.state)
        if best is not None:
            self.ckpt_manager.best_metric = best
        self.start_epoch = max(self.start_epoch, start_epoch)
        self.train_iterations = max(self.start_iteration, start_iteration)

        # ---- compiled steps -----------------------------------------------
        train_metrics = {
            name: m for name, m in Statistics(opts, self.train_metric_names,
                                              self.is_master_node).metrics.items()
        }
        val_metrics = {
            name: m for name, m in Statistics(opts, self.val_metric_names,
                                              self.is_master_node).metrics.items()
        }
        self._train_step = jax.jit(
            make_train_step(model, criteria, self.tx, opts, train_metrics,
                            mixing_fn=self.mixing_fn, augment_fn=self.augment_fn),
            donate_argnums=(0,),
        )
        # --common.accum-after-epoch: accumulation is a trace-time unroll, so
        # the warm epochs use a second freq=1 compile (reference gates the
        # accumulation counter per iteration, training_engine.py:255)
        self.accum_after_epoch = getattr(opts, "common.accum_after_epoch", 0) or 0
        self._train_step_noaccum = None
        if (self.accum_after_epoch > 0
                and (getattr(opts, "common.accum_freq", 1) or 1) > 1):
            self._train_step_noaccum = jax.jit(
                make_train_step(model, criteria, self.tx, opts, train_metrics,
                                mixing_fn=self.mixing_fn,
                                augment_fn=self.augment_fn, accum_freq=1),
                donate_argnums=(0,),
            )
        self._eval_step = jax.jit(make_eval_step(model, criteria, val_metrics))
        self._eval_step_ema = jax.jit(
            make_eval_step(model, criteria, val_metrics, use_ema=True)
        )

    # ------------------------------------------------------------------ state
    def _place_state(self, state):
        """Place the TrainState on the mesh: FSDP/TP shardings when enabled,
        plain replication otherwise (pure DP, the reference's only mode)."""
        from cvnets_tpu.parallel.mesh import MODEL_AXIS

        if self.fsdp or self.mesh.shape.get(MODEL_AXIS, 1) > 1:
            from cvnets_tpu.parallel.sharding_rules import shard_train_state

            return shard_train_state(state, self.mesh, fsdp=self.fsdp)
        return jax.device_put(state, replicated_sharding(self.mesh))

    # ------------------------------------------------------------------ train
    def _maybe_profile(self) -> None:
        """Capture a jax.profiler trace of the first N post-warmup steps when
        --common.profile-trace-dir is set (view with tensorboard/xprof)."""
        trace_dir = getattr(self.opts, "common.profile_trace_dir", None)
        if not trace_dir or getattr(self, "_profile_state", None) == "done":
            return
        n = getattr(self.opts, "common.profile_trace_steps", 5) or 5
        # skip the compile step, trace steps 1..n+1
        if self.train_iterations == 1 and self._profile_state is None:
            jax.profiler.start_trace(trace_dir)
            self._profile_state = "tracing"
            logger.info(f"profiler trace started -> {trace_dir}")
        elif self._profile_state == "tracing" and self.train_iterations > n:
            self._stop_profile()

    def _stop_profile(self) -> None:
        if getattr(self, "_profile_state", None) != "tracing":
            return
        jax.block_until_ready(self.state.params)
        jax.profiler.stop_trace()
        self._profile_state = "done"
        logger.info("profiler trace saved to"
                    f" {getattr(self.opts, 'common.profile_trace_dir', None)}")

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        stats = Statistics(self.opts, self.train_metric_names, self.is_master_node)
        epoch_start = time.time()
        batch_start = time.time()
        samples_seen = 0
        total = getattr(self.train_loader, "__len__", lambda: 0)()
        # total sample count from the sampler (len(loader)*bsz is wrong under
        # the variable batch sampler, advisor r1#5)
        sampler = getattr(self.train_loader, "batch_sampler", None)
        total_samples = getattr(sampler, "n_samples_per_replica", None) \
            or getattr(sampler, "n_samples", None) or 0
        metric_accum = None
        accum_load_t = 0.0

        # H2D placement runs `depth` batches ahead in a background thread so
        # the copy overlaps the device step (docs/perf/PROFILE-loader.md)
        for batch, sharded in device_prefetch(self.train_loader, self.mesh):
            load_t = time.time() - batch_start
            if self.train_iterations >= self.max_iterations:
                break
            lr = self.scheduler.retrieve_lr(epoch, self.train_iterations)
            bn_m = None
            if self.adjust_norm_mom is not None:
                # flax convention (1 - torch momentum); traced scalar like lr
                bn_m = 1.0 - self.adjust_norm_mom.get_momentum(
                    epoch, self.train_iterations)
            step_fn = self._train_step
            if (self._train_step_noaccum is not None
                    and epoch < self.accum_after_epoch):
                step_fn = self._train_step_noaccum
            self.state, metrics = step_fn(
                self.state, sharded, lr, self.rng, epoch, bn_m
            )
            first_leaf = jax.tree_util.tree_leaves(batch["samples"])[0]
            bsz = int(np.asarray(first_leaf).shape[0])
            samples_seen += bsz
            self.train_iterations += 1
            self._maybe_profile()

            # accumulate the (sum, count) pairs ON DEVICE every iteration so the
            # epoch summary averages every batch (reference updates per batch,
            # advisor r1#5); host readback still happens only at log frequency
            if metric_accum is None:
                metric_accum = metrics
            else:
                metric_accum = jax.tree_util.tree_map(
                    jnp.add, metric_accum, metrics)
            accum_load_t += load_t

            if self.train_iterations % self.log_freq == 0:
                host_metrics = jax.device_get(metric_accum)
                stats.update(precomputed=host_metrics,
                             batch_load_time=accum_load_t, batch_size=bsz)
                metric_accum = None
                accum_load_t = 0.0
                stats.iter_summary(epoch, samples_seen, total_samples,
                                   epoch_start, lr)
            if (self.save_interval_freq > 0
                    and self.train_iterations % self.save_interval_freq == 0):
                self.ckpt_manager.save_interval(
                    jax.device_get(self.state), self.train_iterations
                )
            batch_start = time.time()
        if metric_accum is not None:  # flush the sub-log_freq tail
            stats.update(precomputed=jax.device_get(metric_accum),
                         batch_load_time=accum_load_t, batch_size=1)
        self._last_lr = self.scheduler.retrieve_lr(epoch, self.train_iterations)
        self._stop_profile()  # short epochs: close the trace window here
        return stats.avg_statistics_all()

    # -------------------------------------------------------------------- val
    def val_epoch(self, epoch: int, use_ema: bool = False) -> Dict[str, float]:
        if self.val_loader is None:
            return {}
        stats = Statistics(self.opts, self.val_metric_names, self.is_master_node,
                           is_evaluation=True)
        step = self._eval_step_ema if use_ema else self._eval_step
        for batch, sharded in device_prefetch(self.val_loader, self.mesh):
            metrics = step(self.state, sharded)
            bsz = int(np.asarray(jax.tree_util.tree_leaves(batch["samples"])[0]).shape[0])
            stats.update(precomputed=jax.device_get(metrics), batch_size=bsz)
        stage = "validation (EMA)" if use_ema else "validation"
        stats.epoch_summary(epoch, stage=stage)
        self._val_stats = stats
        return stats.avg_statistics_all()

    # ---------------------------------------------- sample-efficient training
    def find_easy_samples(self, epoch: int) -> None:
        """Drop samples the model classifies confidently-correct (reference
        training_engine.py:458-570): a pass over the train set computes per-sample
        true-class probability on device; persistently-easy sample ids are removed
        from the sampler's index list."""
        model = self.model

        @jax.jit
        def true_class_prob(state, samples, targets):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            logits = model.apply(variables, samples, training=False)
            if isinstance(logits, dict):
                logits = logits.get("logits", next(iter(logits.values())))
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            p_true = jnp.take_along_axis(
                probs, jnp.maximum(targets, 0)[:, None], axis=1)[:, 0]
            correct = jnp.argmax(logits, axis=-1) == targets
            return p_true, correct

        import jax.numpy as jnp

        easy_now = set()
        for batch in self.train_loader:
            if "sample_id" not in batch:
                return
            p, c = true_class_prob(
                self.state, jnp.asarray(np.asarray(batch["samples"])),
                jnp.asarray(np.asarray(batch["targets"])))
            p, c = np.asarray(p), np.asarray(c)
            for sid, pi, ci in zip(np.asarray(batch["sample_id"]), p, c):
                if ci and pi >= self.set_confidence:
                    easy_now.add(int(sid))
        for sid in easy_now:
            self._easy_counts[sid] = self._easy_counts.get(sid, 0) + 1
        skip = {s for s, n in self._easy_counts.items() if n >= 2}
        if not skip:
            return
        current = self.train_loader.batch_sampler.img_indices
        all_ids = set(current) if current is not None else set(
            range(self.train_loader.batch_sampler.n_data_samples))
        keep = sorted(all_ids - skip)
        if len(keep) < max(16, len(all_ids) // 10):
            return  # never drop (almost) everything
        self.train_loader.update_indices(keep)
        if self.is_master_node:
            logger.info(
                f"Sample-efficient training: skipping {len(skip)} easy samples"
                f" from epoch {epoch + 1} ({len(keep)} remain)")

    # -------------------------------------------------------------------- run
    def run(self, train_sampler=None) -> None:
        train_sampler = train_sampler or self.train_sampler
        max_checkpoint_metric = getattr(self.opts, "stats.checkpoint_metric_max", False)

        for epoch in range(self.start_epoch, self.max_epochs):
            if train_sampler is not None:
                train_sampler.set_epoch(epoch)
                train_sampler.update_scales(epoch, is_master_node=self.is_master_node)

            train_stats = self.train_epoch(epoch)
            if (self.set_enabled and epoch >= self.set_min_epochs
                    and (epoch + 1) % self.set_every_k == 0):
                self.find_easy_samples(epoch)
            if self.is_master_node and train_stats:
                summary = " || ".join(f"{k}: {v:.4f}" for k, v in train_stats.items())
                logger.log(f"*** Training summary for epoch {epoch}: {summary}")

            val_stats = self.val_epoch(epoch)
            if self.ema_enabled:
                ema_stats = self.val_epoch(epoch, use_ema=True)
                if epoch == self.ema_copy_at_epoch:
                    self.state = self.state.replace(
                        params=self.state.ema_params,
                        batch_stats=(self.state.ema_batch_stats
                                     if self.state.ema_batch_stats is not None
                                     else self.state.batch_stats))
                    logger.info(f"Copied EMA weights into model at epoch {epoch}")
            ckpt_metric = val_stats.get(
                self.ckpt_metric_name,
                val_stats.get("loss", train_stats.get("loss", 0.0)),
            ) if val_stats else train_stats.get("loss", 0.0)

            host_state = jax.device_get(self.state)
            self.ckpt_manager.save(host_state, epoch, self.train_iterations,
                                   float(ckpt_metric))

            if self.train_iterations >= self.max_iterations:
                logger.info("Max iterations reached; stopping.")
                break
        if self.is_master_node:
            logger.info("Training completed.", print_line=True)
