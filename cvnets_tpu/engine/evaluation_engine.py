"""Evaluator (parity: reference engine/evaluation_engine.py:19-203)."""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from cvnets_tpu.engine.train_state import TrainState, make_eval_step
from cvnets_tpu.metrics.stats import Statistics
from cvnets_tpu.parallel import create_mesh, replicated_sharding, shard_batch
from cvnets_tpu.utils import logger


class Evaluator:
    def __init__(self, opts, model, test_loader, criteria=None,
                 state: Optional[TrainState] = None, params=None,
                 batch_stats=None) -> None:
        self.opts = opts
        self.model = model
        self.test_loader = test_loader
        self.is_master_node = jax.process_index() == 0
        self.mesh = create_mesh(opts)

        if criteria is None:
            from cvnets_tpu.loss import build_loss_fn

            criteria = build_loss_fn(opts)
        self.criteria = criteria

        if state is None:
            if params is None:
                rng = jax.random.PRNGKey(getattr(opts, "common.seed", 0) or 0)
                dummy = model.dummy_input_and_label(2)
                variables = model.init({"params": rng, "dropout": rng},
                                       dummy["samples"], training=False)
                params = variables.get("params", {})
                batch_stats = variables.get("batch_stats", {})
            state = TrainState(step=np.zeros((), np.int32), params=params,
                               batch_stats=batch_stats or {}, opt_state=None)
        self.state = jax.device_put(state, replicated_sharding(self.mesh))

        metric_names = getattr(opts, "stats.val", ["loss"])
        self.stats = Statistics(opts, metric_names, self.is_master_node,
                                is_evaluation=True)
        self._eval_step = jax.jit(
            make_eval_step(model, self.criteria, self.stats.metrics)
        )

    def eval_fn_image(self) -> Dict[str, float]:
        start = time.time()
        for batch in self.test_loader:
            sharded = shard_batch(self.mesh, batch)
            metrics = self._eval_step(self.state, sharded)
            self.stats.update(precomputed=jax.device_get(metrics),
                              batch_size=int(np.asarray(batch["samples"]).shape[0]))
        if self.is_master_node:
            self.stats.epoch_summary(0, stage=getattr(
                self.opts, "common.eval_stage_name", "evaluation"))
            logger.info(f"Evaluation took {time.time() - start:.2f} seconds")
        return self.stats.avg_statistics_all()

    def run(self) -> Dict[str, float]:
        modality = getattr(self.opts, "common.inference_modality", "image")
        if modality == "video":
            raise NotImplementedError("video eval arrives with the video pipeline")
        return self.eval_fn_image()
