"""Generate the perf tables in README.md and docs/perf/PROFILE.md from BENCH_r*.json.

Single source of truth for measured numbers (VERDICT r4 #6: the flagship
number drifted between the hand-maintained README table and the PROFILE.md
regression log twice — r3 and r4). The driver writes ``BENCH_r{NN}.json``
after every round; this script parses the metric lines out of each round's
``tail`` and rewrites the marked sections:

* ``docs/perf/PROFILE.md``  — the flagship regression log (one row per round)
* ``README.md``             — the per-model train-step table (latest rc=0 round)

Prose/notes live HERE (they are analysis, versioned with the code); numbers
come only from the BENCH artifacts. Run modes:

    python tools/gen_perf_tables.py            # rewrite both files in place
    python tools/gen_perf_tables.py --check    # exit 1 if either file is stale

``tests/test_conventions.py`` runs ``--check`` so drift fails the suite.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGSHIP = "mobilevit_v2_1.0_train_images_per_sec_per_chip"

# per-round analysis notes for the regression log (prose, not numbers)
ROUND_NOTES = {
    1: "first on-hardware measurement",
    2: "bench timed out before the flagship line (rc=124); fixed by "
       "flagship-first ordering + budget gates",
    3: "no regression; MFU now recorded (BW-bound step, MXU is 1.2% of the "
       "timeline, so low MFU is the expected signature, not a deficiency)",
    4: "no regression; estimates learned from history, sections hard-capped",
    5: "no regression; fused seg-CE kernel landed (DeepLab task 2.4x — "
       "PROFILE-tasks.md), multi-scale cache measured (PROFILE-multiscale.md)",
}

# README train-step table: (metric, display label, static analysis note)
README_ROWS = [
    (FLAGSHIP, "MobileViTv2-1.0 @256 (flagship)",
     "HBM-bandwidth-bound (docs/perf/PROFILE.md)"),
    ("resnet_50_train_images_per_sec_per_chip", "ResNet-50 @224",
     "bs128 beats bs256 (measured)"),
    ("vit_base_train_images_per_sec_per_chip", "ViT-B/16 @224",
     "roofline ratio is a denominator artifact at balanced operating points "
     "— docs/perf/PROFILE-vit.md"),
    ("swin_tiny_train_images_per_sec_per_chip", "Swin-T @224",
     "XLA einsum path is at bytes-speed-of-light; two Pallas window-kernel "
     "generations measured and disabled — docs/perf/PROFILE-swin.md"),
]


def parse_round(path: str) -> dict:
    """Return {metric: line_dict} for one BENCH_r*.json (last line per metric
    wins — bench.py re-emits the flagship last on purpose)."""
    with open(path) as f:
        data = json.load(f)
    out = {"__rc__": data.get("rc")}
    for line in (data.get("tail") or "").splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(rec, dict) and "metric" in rec:
            out[rec["metric"]] = rec
    parsed = data.get("parsed")
    if isinstance(parsed, dict) and "metric" in parsed:
        out.setdefault(parsed["metric"], parsed)
    return out


def load_rounds() -> dict:
    rounds = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds[int(m.group(1))] = parse_round(path)
    return rounds


def _fmt_rate(v: float) -> str:
    return f"{v:,.0f}"


def flagship_log_table(rounds: dict) -> str:
    lines = ["| round | img/s/chip | vs roofline | MFU | note |",
             "|---|---|---|---|---|"]
    for n in sorted(rounds):
        rec = rounds[n].get(FLAGSHIP)
        note = ROUND_NOTES.get(n, "")
        if not rec or not rec.get("value"):
            lines.append(f"| r{n:02d} | — | — | — | {note} |")
            continue
        mfu = rec.get("mfu")
        lines.append(
            f"| r{n:02d} | {_fmt_rate(rec['value'])} | "
            f"{rec['vs_baseline']:.3f} | "
            f"{f'{mfu:.3f}' if mfu else '—'} | {note} |")
    return "\n".join(lines)


def readme_table(rounds: dict) -> str:
    ok = [n for n in sorted(rounds) if rounds[n].get("__rc__") == 0]
    latest = ok[-1] if ok else max(rounds)
    recs = rounds[latest]
    lines = [f"Measured on one TPU v5e chip (round {latest}, from "
             f"`BENCH_r{latest:02d}.json`; regenerate with "
             "`python tools/gen_perf_tables.py`):", "",
             "| train step (bs128) | img/s/chip | vs roofline | MFU | notes |",
             "|---|---|---|---|---|"]
    for metric, label, note in README_ROWS:
        rec = recs.get(metric)
        if not rec or not rec.get("value"):
            lines.append(f"| {label} | — | — | — | {note} |")
            continue
        mfu = rec.get("mfu")
        lines.append(
            f"| {label} | {_fmt_rate(rec['value'])} | "
            f"{rec['vs_baseline']:.2f} | "
            f"{f'{mfu:.3f}' if mfu else '—'} | {note} |")
    return "\n".join(lines)


MARK = {
    "flagship-log": flagship_log_table,
    "readme-perf": readme_table,
}


def rewrite(path: str, key: str, rounds: dict, check: bool) -> bool:
    """Replace the section between ``<!-- {key}:begin/end -->`` markers.
    Returns True if the file content is (now) up to date."""
    with open(path) as f:
        text = f.read()
    begin, end = f"<!-- {key}:begin -->", f"<!-- {key}:end -->"
    if begin not in text or end not in text:
        print(f"ERROR: markers {begin!r} missing in {path}", file=sys.stderr)
        return False
    pre, rest = text.split(begin, 1)
    mid, post = rest.split(end, 1)
    new = f"{pre}{begin}\n{MARK[key](rounds)}\n{end}{post}"
    if new == text:
        return True
    if check:
        # The driver writes BENCH_r{N}.json AFTER the round's last commit, so
        # the newest artifact can postdate the committed tables. Tolerate
        # exactly that: re-check against only the rounds the committed
        # section could have seen (<= the max round number it mentions).
        seen = [int(m) for m in re.findall(r"r(\d+)", mid)]
        if seen:
            upto = {n: r for n, r in rounds.items() if n <= max(seen)}
            if upto and f"{begin}\n{MARK[key](upto)}\n{end}" \
                    == f"{begin}\n{mid.strip()}\n{end}":
                return True
        print(f"STALE: {path} section {key} does not match BENCH_r*.json "
              "(run: python tools/gen_perf_tables.py)", file=sys.stderr)
        return False
    with open(path, "w") as f:
        f.write(new)
    print(f"rewrote {path} [{key}]")
    return True


def main() -> int:
    check = "--check" in sys.argv[1:]
    rounds = load_rounds()
    if not rounds:
        print("no BENCH_r*.json found; nothing to do", file=sys.stderr)
        return 0
    ok = True
    ok &= rewrite(os.path.join(REPO, "docs/perf/PROFILE.md"),
                  "flagship-log", rounds, check)
    ok &= rewrite(os.path.join(REPO, "README.md"),
                  "readme-perf", rounds, check)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
