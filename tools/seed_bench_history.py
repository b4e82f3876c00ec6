"""One-time seeder for BENCH_HISTORY.json: scavenge per-query times from
every committed round record (BENCH_r*.json — whose ``tail`` fields hold
truncated-but-regex-recoverable ``"qNN":sec`` pairs under SHORT names —
plus the full-name BENCH_LOCAL.json) and write the per-query minimum
under FULL query names. bench.py then adjudicates each run against these
cumulative minima and folds its own results back in, so VM-contention
inflation can never compound round-over-round (round-9 verdict finding:
q71 shipped at 14.7 s against a 5.5 s historical best because each round
only saw the previous round's inflated number).

Usage: python tools/seed_bench_history.py   (from the repo root)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from wetsa_cams_solrad_timeseries_spark.plans.registry import QUERIES

    full_by_short = {name.split("_", 1)[0]: name for name in QUERIES}
    best: dict[str, float] = {}

    def fold(name: str, v: float) -> None:
        if v > 0:
            best[name] = min(best.get(name, v), v)

    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        rec = json.load(open(path))
        if rec.get("sf") != 0.1:
            continue
        sources = []
        parsed = rec.get("parsed")
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
            sources.append(parsed["queries"].items())
        tail = rec.get("tail") or ""
        sources.append(
            (m.group(1), float(m.group(2)))
            for m in re.finditer(r'"(q\w+?)":(-?\d+(?:\.\d+)?)', tail)
        )
        for src in sources:
            for short, v in src:
                name = full_by_short.get(short.split("_", 1)[0])
                if name is not None:
                    fold(name, float(v))

    local = os.path.join(ROOT, "BENCH_LOCAL.json")
    if os.path.exists(local):
        rec = json.load(open(local))
        if rec.get("sf") == 0.1:
            for name, v in rec.get("queries", {}).items():
                if name in QUERIES and isinstance(v, (int, float)):
                    fold(name, float(v))

    out = os.path.join(ROOT, "BENCH_HISTORY.json")
    with open(out, "w") as f:
        json.dump({"sf": 0.1, "queries": best}, f, sort_keys=True)
        f.write("\n")
    print(f"seeded {len(best)} queries -> {out}")


if __name__ == "__main__":
    main()
