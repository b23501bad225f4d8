"""Evaluator (parity: reference engine/evaluation_engine.py:19-203)."""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from cvnets_tpu.engine.train_state import TrainState, make_eval_step
from cvnets_tpu.metrics.stats import Statistics
from cvnets_tpu.parallel import create_mesh, replicated_sharding, shard_batch
from cvnets_tpu.parallel.mesh import set_active_mesh
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
        set_active_mesh(self.mesh)

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
        subset = getattr(opts, "stats.logit_subset_indices", None)
        import jax.numpy as jnp

        subset_arr = jnp.asarray(subset) if subset else None
        self._eval_step = jax.jit(
            make_eval_step(model, self.criteria, self.stats.metrics,
                           logit_subset=subset_arr)
        )

    def eval_fn_image(self) -> Dict[str, float]:
        start = time.time()
        for batch in self.test_loader:
            sharded = shard_batch(self.mesh, batch)
            metrics = self._eval_step(self.state, sharded)
            self.stats.update(precomputed=jax.device_get(metrics),
                              batch_size=int(np.asarray(jax.tree_util.tree_leaves(batch["samples"])[0]).shape[0]))
        if self.is_master_node:
            self.stats.epoch_summary(0, stage=getattr(
                self.opts, "common.eval_stage_name", "evaluation"))
            logger.info(f"Evaluation took {time.time() - start:.2f} seconds")
        return self.stats.avg_statistics_all()

    def eval_fn_video(self) -> Dict[str, float]:
        """Multi-clip voting eval (reference evaluation_engine.py:115-180):
        [B, clips] forward → vote sum/max over clips."""
        import jax.numpy as jnp

        voting = getattr(self.opts,
                         "model.video_classification.clip_out_voting_fn", "sum")

        @jax.jit
        def clip_logits(state, samples):
            b, n_clips = samples.shape[:2]
            folded = samples.reshape((b * n_clips,) + samples.shape[2:])
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            logits = self.model.apply(variables, folded, training=False)
            logits = logits.reshape(b, n_clips, -1)
            if voting == "max":
                return jnp.max(logits, axis=1)
            return jnp.sum(logits, axis=1)

        for batch in self.test_loader:
            samples = jnp.asarray(np.asarray(batch["samples"]))
            logits = clip_logits(self.state, samples)
            targets = jnp.asarray(np.asarray(batch["targets"]))
            precomputed = {}
            for name, metric in self.stats.metrics.items():
                bv = getattr(metric, "batch_values", None)
                if bv is not None:
                    precomputed[name] = jax.device_get(
                        bv(logits, targets, {"loss": 0.0}))
            self.stats.update(precomputed=precomputed,
                              batch_size=int(samples.shape[0]))
        if self.is_master_node:
            self.stats.epoch_summary(0, stage="evaluation (video)")
        return self.stats.avg_statistics_all()

    def eval_fn_zero_shot(self, class_caption_tokens) -> Dict[str, float]:
        """CLIP zero-shot classification (reference clip.py:171-202 +
        text_encoders zero-shot forward): encode each class's caption set once
        (mean-pooled, normalized), then score images against the cached class
        embeddings with 100·img@textᵀ logits."""
        import jax.numpy as jnp

        from cvnets_tpu.metrics.topk_accuracy import top_k_correct

        tokens = jnp.asarray(class_caption_tokens)  # (C, n_captions, L)

        @jax.jit
        def class_embeddings(state, tokens):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            return self.model.apply(variables, tokens, training=False,
                                    method=self.model.encode_text)

        # chunk classes to bound memory (text encoder over C*n_captions seqs)
        chunks = []
        C = tokens.shape[0]
        step = 100
        for c0 in range(0, C, step):
            chunks.append(jax.device_get(
                class_embeddings(self.state, tokens[c0: c0 + step])))
        text_emb = jnp.asarray(np.concatenate(chunks, axis=0))  # (C, D)

        @jax.jit
        def image_logits(state, images):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            img_emb = self.model.apply(variables, images, training=False,
                                       method=self.model.encode_image)
            return 100.0 * img_emb @ text_emb.T.astype(img_emb.dtype)

        n_correct = {1: 0.0, 5: 0.0}
        n_total = 0
        for batch in self.test_loader:
            images = jnp.asarray(np.asarray(batch["samples"]))
            targets = jnp.asarray(np.asarray(batch["targets"]))
            logits = image_logits(self.state, images)
            for k in (1, 5):
                n_correct[k] += float(top_k_correct(logits, targets, k))
            n_total += int(images.shape[0])
        out = {f"top{k}": 100.0 * v / max(n_total, 1)
               for k, v in n_correct.items()}
        if self.is_master_node:
            logger.info(f"Zero-shot evaluation: {out}")
        return out

    def run(self) -> Dict[str, float]:
        modality = getattr(self.opts, "common.inference_modality", "image")
        if modality == "video":
            return self.eval_fn_video()
        dataset = getattr(self.test_loader, "dataset", None)
        if dataset is not None and hasattr(dataset, "class_caption_tokens"):
            return self.eval_fn_zero_shot(dataset.class_caption_tokens())
        return self.eval_fn_image()
