"""Argument aggregation: every subsystem registry contributes its flags here.

Parity: reference options/opts.py:288 (get_training_arguments). Flags use dashes
(``--common.config-file``); namespace attributes use underscores inside dotted keys
(``common.config_file``) — the same convention the reference enforces with an AST test.

TPU deltas vs the reference:
* ``--ddp.*`` flags are accepted for config compatibility but are inert; distribution
  is configured through ``--dev.*`` (mesh axes) and `jax.distributed`.
* mixed precision defaults to bfloat16 (no GradScaler needed on TPU).
"""

from __future__ import annotations

import argparse
from typing import List, Optional

from cvnets_tpu.options.parse_args import ParseKwargs
from cvnets_tpu.options.utils import load_config_file


def arguments_common(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group(title="Common arguments")
    group.add_argument("--taskname", type=str, default="", help="Task name (free-form)")
    group.add_argument("--common.seed", type=int, default=0, help="Random seed")
    group.add_argument("--common.config-file", type=str, default=None)
    group.add_argument("--common.results-loc", type=str, default="results")
    group.add_argument("--common.run-label", type=str, default="run_1")
    group.add_argument("--common.eval-stage-name", type=str, default="evaluation")
    group.add_argument("--common.resume", type=str, default=None)
    group.add_argument("--common.finetune", type=str, default=None)
    group.add_argument("--common.finetune-ema", type=str, default=None)
    group.add_argument("--common.mixed-precision", action="store_true")
    group.add_argument(
        "--common.int8-inference", action="store_true",
        help="Int8 conv/linear forward (inference only). Param tree is "
             "unchanged, so float checkpoints load directly; serving should "
             "prequantize via quantization.prequantize_variables.",
    )
    group.add_argument(
        "--common.int8-mode", type=str, default="weight-only",
        choices=("dynamic", "weight-only"),
        help="int8 scheme: 'weight-only' (default, the measured win — "
             "docs/perf/PROFILE-int8.md): int8 weight storage dequantized "
             "into bf16 matmuls, halving parameter HBM bytes; 'dynamic' "
             "(opt-in tracking mode): s8xs8->s32 MXU matmuls with dynamic "
             "per-row/per-sample activation scales — measured break-even vs "
             "bf16 on the benched models.",
    )
    group.add_argument(
        "--common.mixed-precision-dtype",
        type=str,
        default="bfloat16",
        choices=["float16", "bfloat16", "float32"],
        help="Compute dtype under mixed precision; bfloat16 is native on TPU",
    )
    group.add_argument("--common.accum-freq", type=int, default=1)
    group.add_argument("--common.accum-after-epoch", type=int, default=0)
    group.add_argument("--common.log-freq", type=int, default=100)
    group.add_argument(
        "--common.profile-trace-dir", type=str, default=None,
        help="Capture a jax.profiler trace of the first few train steps into"
             " this directory (TPU equivalent of the reference's fvcore/"
             "autograd profiling hooks)")
    group.add_argument("--common.profile-trace-steps", type=int, default=5)
    group.add_argument("--common.auto-resume", action="store_true")
    group.add_argument("--common.grad-clip", type=float, default=None)
    group.add_argument("--common.k-best-checkpoints", type=int, default=5)
    group.add_argument("--common.save-all-checkpoints", action="store_true", default=False)
    group.add_argument(
        "--common.inference-modality", type=str, default="image",
        choices=["image", "video"],
    )
    group.add_argument(
        "--common.channels-last", action="store_true", default=False,
        help="Accepted for config compatibility; cvnets_tpu is NHWC-native on TPU.",
    )
    group.add_argument("--common.tensorboard-logging", action="store_true")
    group.add_argument(
        "--common.override-kwargs", nargs="*", action=ParseKwargs,
        help="Override config entries, e.g. sampler.bs.crop_size_width=512",
    )
    group.add_argument("--common.enable-coreml-compatible-module", action="store_true")
    group.add_argument("--common.debug-mode", action="store_true")
    group.add_argument("--common.save-interval-freq", type=int, default=0)
    return parser


def arguments_dev(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """TPU device/mesh arguments (replaces reference --ddp.* process plumbing)."""
    group = parser.add_argument_group(title="Device/mesh arguments")
    group.add_argument(
        "--dev.device", type=str, default=None,
        help="jax platform to use (tpu/gpu/cpu); default = jax default backend",
    )
    group.add_argument(
        "--dev.num-devices", type=int, default=-1,
        help="Number of devices to use; -1 = all visible devices",
    )
    group.add_argument(
        "--dev.mesh-shape", type=int, nargs="*", default=None,
        help="Device mesh shape, e.g. 8 (pure DP) or 4 2 (DP x model). Default: all"
        " devices on a single 'data' axis.",
    )
    group.add_argument(
        "--dev.mesh-axis-names", type=str, nargs="*", default=None,
        help="Names for the mesh axes; default ('data',) or ('data','model')",
    )
    group.add_argument(
        "--dev.fsdp", action="store_true", default=False,
        help="Shard parameters, Adam moments and the EMA copy over the data"
        " axis (ZeRO-3-style FSDP); XLA inserts the all-gather/reduce-scatter"
        " collectives over ICI. Math-identical to plain DP, per-device state"
        " memory drops ~linearly with the data-axis size.",
    )
    group.add_argument(
        "--dev.sequence-parallel", action="store_true", default=False,
        help="Shard attention over the sequence dim of the mesh's 'model'"
        " axis (ring attention: kv slices rotate via ppermute, exact"
        " softmax, no device holds the full sequence). Needs a >1 'model'"
        " mesh axis whose size divides the token count; attention layers"
        " fall back to the local path otherwise.",
    )
    group.add_argument(
        "--model.moe.aux-loss-weight", type=float, default=0.01,
        help="Weight on the MoE load-balance auxiliary loss (modules/moe.py)"
        " added by the train step when a model sows into the 'moe_loss'"
        " collection. Expert weights shard over the mesh's 'model' axis"
        " (expert parallelism).",
    )
    return parser


def arguments_ddp(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """Inert DDP flags kept so reference-era yamls load without warnings."""
    group = parser.add_argument_group(title="DDP arguments (config-compat, inert on TPU)")
    group.add_argument("--ddp.rank", type=int, default=0)
    group.add_argument("--ddp.world-size", type=int, default=-1)
    group.add_argument("--ddp.dist-url", type=str, default=None)
    group.add_argument("--ddp.dist-port", type=int, default=30786)
    group.add_argument("--ddp.device-id", type=int, default=None)
    group.add_argument("--ddp.backend", type=str, default="xla")
    group.add_argument("--ddp.find-unused-params", action="store_true", default=False)
    group.add_argument("--ddp.use-deprecated-data-parallel", action="store_true", default=False)
    return parser


def parser_to_opts(
    parser: argparse.ArgumentParser, args: Optional[List[str]] = None
) -> argparse.Namespace:
    opts = parser.parse_args(args)
    return load_config_file(opts)


def get_training_arguments(
    parse_args: bool = True, args: Optional[List[str]] = None
):
    # imported here (not at module top) so registries lazy-load without cycles
    from cvnets_tpu.data.collate import arguments_collate_fn
    from cvnets_tpu.data.datasets import arguments_dataset
    from cvnets_tpu.data.sampler import add_sampler_arguments
    from cvnets_tpu.data.text_tokenizer import arguments_tokenizer
    from cvnets_tpu.data.transforms import arguments_augmentation
    from cvnets_tpu.data.video_reader import arguments_video_reader
    from cvnets_tpu.loss import add_loss_fn_arguments
    from cvnets_tpu.metrics import METRICS_REGISTRY, arguments_stats
    from cvnets_tpu.models import modeling_arguments
    from cvnets_tpu.optim import arguments_optimizer
    from cvnets_tpu.optim.scheduler import arguments_scheduler

    parser = argparse.ArgumentParser(description="Training arguments", add_help=True)
    parser = arguments_dataset(parser)
    parser = modeling_arguments(parser)
    parser = add_sampler_arguments(parser)
    parser = arguments_collate_fn(parser)
    parser = arguments_augmentation(parser)
    # reference opts.py:309: every --image-augmentation.* flag is duplicated
    # under --frame-augmentation.* so video pipelines configure per-frame augs
    # without overloading the image keys
    from cvnets_tpu.options.utils import extend_selected_args_with_prefix

    parser = extend_selected_args_with_prefix(
        parser, match_prefix="--image-augmentation.",
        additional_prefix="--frame-augmentation.")
    parser = arguments_video_reader(parser)
    parser = add_loss_fn_arguments(parser)
    parser = arguments_optimizer(parser)
    parser = arguments_scheduler(parser)
    parser = arguments_dev(parser)
    parser = arguments_ddp(parser)
    parser = arguments_stats(parser)
    parser = arguments_common(parser)
    parser = arguments_tokenizer(parser)
    parser = METRICS_REGISTRY.all_arguments(parser)

    if parse_args:
        return parser_to_opts(parser, args)
    return parser


def get_eval_arguments(parse_args: bool = True, args: Optional[List[str]] = None):
    """Eval args == training args: the offline-eval mode flags
    (--evaluation.{detection,segmentation}.*) are registered by
    base_detection/base_segmentation add_arguments."""
    return get_training_arguments(parse_args=parse_args, args=args)


def get_conversion_arguments(args: Optional[List[str]] = None):
    """Export/conversion args (reference get_conversion_arguments :344; the
    coreml-specific flags are kept for config compatibility, the export target
    here is StableHLO)."""
    parser = get_training_arguments(parse_args=False)
    group = parser.add_argument_group("Conversion arguments")
    group.add_argument("--conversion.coreml-extn", type=str, default="mlmodel")
    group.add_argument("--conversion.input-image-path", type=str, default=None)
    group.add_argument("--conversion.bucket-name", type=str)
    group.add_argument("--conversion.task-id", type=str)
    group.add_argument("--conversion.viewers", type=str, nargs="+", default=None)
    group.add_argument("--conversion.reparameterize", action="store_true",
                       default=False,
                       help="Fold re-parameterizable branches (MobileOne/"
                            "FastViT) into deploy form before export")
    return parser_to_opts(parser, args=args)


def get_benchmarking_arguments(args: Optional[List[str]] = None):
    parser = get_training_arguments(parse_args=False)
    group = parser.add_argument_group("Benchmarking arguments")
    group.add_argument("--benchmark.batch-size", type=int, default=1)
    group.add_argument("--benchmark.warmup-iter", type=int, default=10)
    group.add_argument("--benchmark.n-iter", type=int, default=100)
    group.add_argument("--benchmark.use-jit-model", action="store_true")
    group.add_argument(
        "--benchmark.data-pipeline", action="store_true", default=False,
        help="Benchmark host preprocess throughput (JPEG decode + train"
             " transforms + collate) instead of model inference")
    group.add_argument("--benchmark.data-pipeline-samples", type=int,
                       default=512)
    return parser_to_opts(parser, args=args)


def get_loss_landscape_args(args: Optional[List[str]] = None):
    parser = get_training_arguments(parse_args=False)
    group = parser.add_argument_group("Loss landscape related arguments")
    group.add_argument("--loss-landscape.n-points", type=int, default=11)
    group.add_argument("--loss-landscape.min-x", type=float, default=-1.0)
    group.add_argument("--loss-landscape.max-x", type=float, default=1.0)
    group.add_argument("--loss-landscape.min-y", type=float, default=-1.0)
    group.add_argument("--loss-landscape.max-y", type=float, default=1.0)
    return parser_to_opts(parser, args=args)
