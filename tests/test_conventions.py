"""Convention tests (parity: reference tests/test_conventions.py:19-52): AST walk
enforcing underscores in getattr/setattr dotted keys and dashes in argparse flags."""

import ast
import os

REPO = os.path.join(os.path.dirname(__file__), "..")
PKG = os.path.join(REPO, "cvnets_tpu")


def _py_files():
    for dirpath, _d, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(dirpath, f)


def test_getattr_keys_use_underscores():
    bad = []
    for path in _py_files():
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                    and node.func.id in ("getattr", "setattr", "hasattr")
                    and len(node.args) >= 2
                    and isinstance(node.args[1], ast.Constant)
                    and isinstance(node.args[1].value, str)):
                key = node.args[1].value
                if "-" in key:
                    bad.append(f"{path}:{node.lineno}: {key}")
    assert not bad, "\n".join(bad)


def test_perf_tables_match_bench_artifacts():
    """README.md and docs/perf/PROFILE.md perf tables are GENERATED from
    BENCH_r*.json (tools/gen_perf_tables.py); hand-edited drift fails here
    (VERDICT r4 #6 — the flagship number drifted two rounds in a row)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_perf_tables.py"),
         "--check"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr


def test_argparse_flags_use_dashes():
    bad = []
    for path in _py_files():
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "add_argument" and node.args
                    and isinstance(node.args[0], ast.Constant)
                    and isinstance(node.args[0].value, str)):
                flag = node.args[0].value
                if flag.startswith("--") and "_" in flag:
                    bad.append(f"{path}:{node.lineno}: {flag}")
    assert not bad, "\n".join(bad)
