"""YAML config loading: flatten nested yaml to dotted keys and apply onto argparse
namespace (parity: reference options/utils.py:34-184)."""

from __future__ import annotations

import argparse
import collections.abc
import os
import re
from typing import Any, Dict

import yaml

from cvnets_tpu.utils import logger

DEFAULT_CONFIG_DIR = "config"
META_PARAMS_REGEX = r"tasks|include_configs"


def flatten_yaml_as_dict(d: Dict, parent_key: str = "", sep: str = ".") -> Dict[str, Any]:
    """Flatten nested mappings into dotted keys: {"a": {"b": 1}} -> {"a.b": 1}."""
    items = {}
    for k, v in d.items():
        new_key = f"{parent_key}{sep}{k}" if parent_key else k
        if isinstance(v, collections.abc.MutableMapping):
            items.update(flatten_yaml_as_dict(v, new_key, sep=sep))
        else:
            items[new_key] = v
    return items


def load_config_file(opts: argparse.Namespace) -> argparse.Namespace:
    """Load ``--common.config-file`` yaml onto ``opts``.

    Only keys the parser already knows are applied; unknown keys warn (reference
    options/utils.py:74-89). CLI ``--common.override-kwargs`` values are applied
    after the file.
    """
    config_file_name = getattr(opts, "common.config_file", None)
    if config_file_name is None:
        return opts

    if not os.path.isfile(config_file_name):
        candidate = os.path.join(DEFAULT_CONFIG_DIR, config_file_name)
        if os.path.isfile(candidate):
            config_file_name = candidate
        else:
            logger.error(f"Configuration file does not exist at {config_file_name}")

    setattr(opts, "common.config_file", config_file_name)
    with open(config_file_name) as yaml_file:
        try:
            cfg = yaml.load(yaml_file, Loader=yaml.FullLoader)
        except yaml.YAMLError as exc:
            logger.error(f"Error while loading config file {config_file_name}: {exc}")
    if cfg:
        for k, v in flatten_yaml_as_dict(cfg).items():
            if hasattr(opts, k):
                setattr(opts, k, v)
            elif "local_" not in k and not re.match(META_PARAMS_REGEX, k):
                logger.warning(f"Unrecognized yaml config entry: {k}")

    override_args = getattr(opts, "override_args", None)
    if override_args:
        for k, v in override_args.items():
            if hasattr(opts, k):
                setattr(opts, k, v)
            else:
                logger.warning(f"Unrecognized override entry: {k}")
    return opts


def extend_selected_args_with_prefix(
    parser: argparse.ArgumentParser, match_prefix: str, additional_prefix: str
) -> argparse.ArgumentParser:
    """Duplicate every ``--model.*`` flag as ``--teacher.model.*`` (reference
    options/utils.py:103-148); used by distillation to configure the teacher."""
    regexp = r"--[^_]+\."
    assert re.match(regexp, match_prefix), match_prefix
    assert re.match(regexp, additional_prefix), additional_prefix

    for action in list(parser._actions):
        for option_string in action.option_strings:
            if option_string.startswith(match_prefix):
                parser.add_argument(
                    option_string.replace(match_prefix, additional_prefix),
                    nargs="?"
                    if isinstance(action, argparse._StoreTrueAction)
                    else action.nargs,
                    const=action.const,
                    default=action.default,
                    type=action.type,
                    choices=action.choices,
                    help=action.help,
                    metavar=action.metavar,
                )
    return parser


def extract_opts_with_prefix_replacement(
    opts: argparse.Namespace, match_prefix: str, replacement_prefix: str
) -> argparse.Namespace:
    """Copy ``teacher.model.*`` opts back out as ``model.*`` (reference
    options/utils.py:151-184)."""
    regexp = r"[^-]+\."
    assert re.match(regexp, match_prefix), match_prefix
    assert re.match(regexp, replacement_prefix), replacement_prefix
    result = {
        k.replace(match_prefix, replacement_prefix, 1): v
        for k, v in vars(opts).items()
        if k.startswith(match_prefix)
    }
    return argparse.Namespace(**result)
