"""Derive (and optionally rewrite) the driver-window ordering of
``__spark_entry__.queries()`` from the committed CORRECTNESS_r*.json
records — the mechanical first task of every round (CLAUDE.md rule 7).

Policy: never-recorded queries first (original order), then cohorts by
ascending newest-record round, original order within a cohort — except
that previously-RED queries may be pre-ordered to head their cohort
(VERDICT r7 authorized this amendment for x75; pass ``--front NAME`` to
apply it to others).

Usage:
    python tools/rotate_window.py              # report: prints the
                                               # required order + whether
                                               # the committed order obeys
                                               # the freshness test
    python tools/rotate_window.py --write      # rewrite queries() in
                                               # __spark_entry__.py
    python tools/rotate_window.py --write --front x75_kmeans_train

The rewrite only reorders dict entries (and regenerates the cohort
comment banners) — keys, callables and everything outside the dict body
are untouched.  Run the suite afterwards:
tests/test_contract_consistency.py enforces the result.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")


def latest_records() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for q in json.load(open(path)):
            latest[q] = max(latest.get(q, 0), rnd)
    return latest


def current_entries(src: str) -> list[tuple[str, str]]:
    m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}\n", src, re.S)
    if not m:
        raise SystemExit("could not locate the queries() dict body")
    return re.findall(r'"([a-z0-9_]+)": (_q_[a-z0-9_]+),', m.group(1))


def required_order(
    names: list[str], latest: dict[str, int], front: list[str]
) -> list[str]:
    cohorts: dict[int, list[str]] = {}
    for n in names:
        cohorts.setdefault(latest.get(n, 0), []).append(n)
    out: list[str] = []
    for rnd in sorted(cohorts):
        members = cohorts[rnd]
        heads = [n for n in front if n in members]
        out.extend(heads + [n for n in members if n not in heads])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument(
        "--front",
        action="append",
        default=[],
        help="pre-order this query to head its cohort (previously-red "
        "queries only — the authorized tie-break amendment)",
    )
    args = ap.parse_args()

    src = open(ENTRY).read()
    entries = current_entries(src)
    names = [n for n, _ in entries]
    fn = dict(entries)
    latest = latest_records()
    unknown = set(latest) - set(names)
    if unknown:
        print(f"note: {len(unknown)} recorded queries not in queries() "
              f"(renamed/removed?): {sorted(unknown)[:5]}", file=sys.stderr)

    want = required_order(names, latest, args.front)
    window, tail = want[:50], want[50:]
    worst_in = max(latest.get(q, 0) for q in window)
    best_out = min(latest.get(q, 0) for q in tail) if tail else 99
    print(f"{len(names)} queries; window cohorts ok: {worst_in <= best_out}")
    print("window head:", window[:5], "... tail head:", tail[:3])
    if names == want:
        print("committed order ALREADY matches the required rotation")
        return
    if not args.write:
        first_diff = next(i for i, (a, b) in enumerate(zip(names, want)) if a != b)
        print(f"order differs from position {first_diff} "
              f"({names[first_diff]!r} vs {want[first_diff]!r}); "
              "re-run with --write to rewrite")
        return

    max_round = max(latest.values(), default=0)
    lines = ["    return {"]
    prev = None
    for n in want:
        rnd = latest.get(n, 0)
        if rnd != prev:
            label = (
                f"never driver-recorded (round-{max_round + 1} additions "
                "rotate in first)"
                if rnd == 0
                else f"last driver-recorded in round {rnd}"
            )
            lines.append(f"        # -- {label} " + "-" * max(1, 66 - len(label)))
            prev = rnd
        lines.append(f'        "{n}": {fn[n]},')
    lines.append("    }")
    m = re.search(r"(    return \{.*?\n    \})", src, re.S)
    new_src = src[: m.start(1)] + "\n".join(lines) + src[m.end(1):]
    open(ENTRY, "w").write(new_src)
    print(f"rewrote queries() in {ENTRY}; run the suite "
          "(tests/test_contract_consistency.py) to confirm")


if __name__ == "__main__":
    main()
