#!/usr/bin/env python
"""Per-query bench regression guard (VERDICT r2 task 6).

Compares the two most recent ``BENCH_r{N}.json`` files (or any two
passed explicitly) query-by-query and reports regressions above a
threshold, so a single-query drift (like round 2's benign +5% on
``agg_pricing_summary``) surfaces automatically instead of hiding
inside a healthy total.

Usage::

    python scripts/bench_compare.py                 # latest two BENCH_r*.json
    python scripts/bench_compare.py OLD.json NEW.json
    python scripts/bench_compare.py --threshold 1.5 --strict

Exit code is 0 unless ``--strict`` is given and a regression exceeds
the threshold. Queries present in only one file are listed but never
fail the check (the extended set grows between rounds by design).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def _latest_two(repo_root: str) -> tuple[str, str]:
    paths = glob.glob(os.path.join(repo_root, "BENCH_r*.json"))

    def round_no(p: str) -> int:
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    paths = sorted((p for p in paths if round_no(p) >= 0), key=round_no)
    if len(paths) < 2:
        raise SystemExit(
            f"need two BENCH_r*.json files to compare, found {len(paths)}"
        )
    return paths[-2], paths[-1]


def _load_bench(path: str) -> dict:
    """Load a bench result: either bench.py's raw JSON line, or the
    round driver's wrapper ({"n", "rc", "cpus", "tail": "...<json>"})
    where the bench line is embedded in captured output."""
    with open(path) as f:
        data = json.load(f)
    if "queries" in data:
        return data
    for line in reversed(data.get("tail", "").splitlines()):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"{path}: no bench JSON line found")


def compare(old_path: str, new_path: str, threshold: float) -> dict:
    old = _load_bench(old_path)
    new = _load_bench(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    # Canary normalization (VERDICT r3 task 3): each round runs on a
    # fresh VM with 30-50% uniform drift; the fixed CPU-bound canary
    # (bench.py:_run_canary) measures that drift, so when both files
    # carry canary_s the regression gate uses the canary-NORMALIZED
    # ratio — (t_new/canary_new)/(t_old/canary_old) — and raw ratios
    # are reported for reference. Old files without a canary fall
    # back to raw ratios (vm_factor = 1).
    c_old, c_new = old.get("canary_s"), new.get("canary_s")
    vm_factor = (c_new / c_old) if (c_old and c_new) else None
    report = {
        "old": os.path.basename(old_path),
        "new": os.path.basename(new_path),
        "threshold": threshold,
        "canary_old_s": c_old,
        "canary_new_s": c_new,
        "vm_factor": round(vm_factor, 3) if vm_factor else None,
        "normalized": vm_factor is not None,
        "regressions": [],
        "improvements": [],
        "only_old": sorted(set(oq) - set(nq)),
        "only_new": sorted(set(nq) - set(oq)),
        "stable_total_old": old.get("value"),
        "stable_total_new": new.get("value"),
    }
    for name in shared:
        t_old, t_new = oq[name], nq[name]
        if t_old <= 0:
            continue
        raw = t_new / t_old
        norm = raw / vm_factor if vm_factor else raw
        entry = {"query": name, "old_s": t_old, "new_s": t_new,
                 "raw_ratio": round(raw, 3), "norm_ratio": round(norm, 3)}
        if norm > threshold:
            report["regressions"].append(entry)
        elif norm < 1 / threshold:
            report["improvements"].append(entry)
    report["regressions"].sort(key=lambda e: -e["norm_ratio"])
    report["improvements"].sort(key=lambda e: e["norm_ratio"])
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="OLD.json NEW.json (default: latest two)")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag queries slower than OLD * threshold (default 1.5)")
    ap.add_argument("--strict", action="store_true",
                    help="exit 1 if any regression exceeds the threshold")
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if len(args.files) == 2:
        old_path, new_path = args.files
    elif not args.files:
        old_path, new_path = _latest_two(repo_root)
    else:
        ap.error("pass exactly two files or none")

    report = compare(old_path, new_path, args.threshold)
    print(json.dumps(report, indent=2))
    if args.strict and report["regressions"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
