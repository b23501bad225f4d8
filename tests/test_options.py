"""Config-system tests (yaml flatten, load, override; reference options/ tests)."""

import argparse

from cvnets_tpu.options.utils import (
    extend_selected_args_with_prefix,
    extract_opts_with_prefix_replacement,
    flatten_yaml_as_dict,
    load_config_file,
)


def test_flatten_nested_yaml():
    nested = {"model": {"classification": {"name": "resnet", "n_classes": 10}}}
    assert flatten_yaml_as_dict(nested) == {
        "model.classification.name": "resnet",
        "model.classification.n_classes": 10,
    }


def test_load_config_applies_known_keys(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("sampler:\n  name: batch_sampler\n")
    parser = argparse.ArgumentParser()
    parser.add_argument("--common.config-file", type=str, default=None)
    parser.add_argument("--sampler.name", type=str, default="variable_batch_sampler")
    opts = parser.parse_args(["--common.config-file", str(cfg)])
    opts = load_config_file(opts)
    assert getattr(opts, "sampler.name") == "batch_sampler"


def test_override_kwargs_applied_after_config(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("sampler:\n  name: batch_sampler\n")
    parser = argparse.ArgumentParser()
    parser.add_argument("--common.config-file", type=str, default=None)
    parser.add_argument("--sampler.name", type=str, default="x")
    opts = parser.parse_args(["--common.config-file", str(cfg)])
    setattr(opts, "override_args", {"sampler.name": "multi_scale_sampler"})
    opts = load_config_file(opts)
    assert getattr(opts, "sampler.name") == "multi_scale_sampler"


def test_teacher_prefix_round_trip():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model.classification.name", type=str, default=None)
    parser = extend_selected_args_with_prefix(
        parser, match_prefix="--model.", additional_prefix="--teacher.model."
    )
    opts = parser.parse_args(
        ["--teacher.model.classification.name", "resnet"]
    )
    teacher_opts = extract_opts_with_prefix_replacement(
        opts, "teacher.model.", "model."
    )
    assert getattr(teacher_opts, "model.classification.name") == "resnet"


def test_training_arguments_aggregate():
    from cvnets_tpu.options.opts import get_training_arguments

    opts = get_training_arguments(args=[])
    # flags from several subsystems present
    for key in ("common.seed", "model.classification.n_classes", "optim.name",
                "scheduler.name", "stats.val", "ema.momentum"):
        assert hasattr(opts, key), key
