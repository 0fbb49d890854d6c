#!/usr/bin/env python
"""Bench regression gate (r6 verdict ask #6, landed r8).

Compares two full bench snapshots (the ``bench_full_latest.json``
format: per-query min-of-N serve seconds plus a builds map) and exits
non-zero when any query regressed beyond the threshold — the
119-query TOTAL hides single-query regressions (a 0.1 s query going
5× slower moves the total by ~1%), and min-of-2 data has been
flake-free for two rounds (``flaky: []``), which is clean enough to
gate on.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]
                                  [--min-seconds 0.15]

- A query is flagged only if BOTH (new >= old * threshold) AND
  (new - old >= min-seconds): tiny queries jitter multiplicatively
  (0.04 s → 0.07 s is "1.75×" of nothing), so an absolute floor
  keeps the gate meaningful.
- Removed queries are reported (a silently dropped query is a
  coverage regression, not a perf win); new queries are listed
  informationally.
- Builds are compared with the same rule but never gate (one-time
  costs; they are charged to the builds map precisely because they
  are not serve latencies).

Exit codes: 0 clean, 1 regression(s), 2 usage/load error.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        raise ValueError(f"{path}: not a bench snapshot (no 'queries' map)")
    return d


def compare(
    old: dict, new: dict, threshold: float, min_seconds: float
) -> dict:
    oq, nq = old["queries"], new["queries"]
    # Canary normalization (r14): both snapshots record a fixed
    # single-thread CPU probe (bench._canary). speed = new/old canary
    # ratio — >1 means the new host was effectively slower; dividing
    # each per-query time by its run's canary removes host speed from
    # the signal, so the gate fires on CODE regressions, not on the
    # driver box being busy (r12/r13 were both adjudicated "host, not
    # code" by hand; this makes it arithmetic). A real uniform code
    # regression still fires: it moves query times, not the canary.
    co, cn = old.get("canary_s"), new.get("canary_s")
    speed = round(float(cn) / float(co), 4) if co and cn else None
    regressions = []
    improvements = []
    for name in sorted(set(oq) & set(nq)):
        a, b = float(oq[name]), float(nq[name])
        bn = b / speed if speed else b
        entry = {
            "query": name,
            "old_s": a,
            "new_s": b,
            "ratio": round(b / a, 2),
        }
        if speed:
            entry["ratio_normalized"] = round(bn / a, 2)
        if bn >= a * threshold and bn - a >= min_seconds:
            regressions.append(entry)
        elif a >= bn * threshold and a - bn >= min_seconds:
            improvements.append(entry)
    build_notes = []
    for name in sorted(set(old.get("builds", {})) & set(new.get("builds", {}))):
        a = float(old["builds"][name])
        b = float(new["builds"][name])
        if b >= a * threshold and b - a >= min_seconds:
            build_notes.append(
                {"build": name, "old_s": a, "new_s": b, "ratio": round(b / a, 2)}
            )
    return {
        "old_total_s": old.get("value"),
        "new_total_s": new.get("value"),
        "host_speed_ratio": speed,
        "host_speed_note": (
            None
            if speed is None
            else (
                f"new run's CPU canary took {speed}x the old run's "
                "(>1 = new host effectively slower); gate evaluated on "
                "canary-normalized times"
            )
        ),
        "host_loaded_flags": {
            "old": bool(old.get("host_loaded")),
            "new": bool(new.get("host_loaded")),
        },
        "compared": len(set(oq) & set(nq)),
        "removed_queries": sorted(set(oq) - set(nq)),
        "added_queries": sorted(set(nq) - set(oq)),
        "regressions": regressions,
        "improvements": improvements,
        "build_regressions_informational": build_notes,
    }


def main() -> int:
    args = [a for a in sys.argv[1:]]
    threshold, min_seconds = 1.5, 0.15
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        del args[i : i + 2]
    if "--min-seconds" in args:
        i = args.index("--min-seconds")
        min_seconds = float(args[i + 1])
        del args[i : i + 2]
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    try:
        old, new = load(args[0]), load(args[1])
    except (OSError, ValueError, json.JSONDecodeError) as e:
        print(f"bench_compare: {e}", file=sys.stderr)
        return 2
    report = compare(old, new, threshold, min_seconds)
    print(json.dumps(report, indent=2))
    if report["regressions"] or report["removed_queries"]:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
