"""Whole-inventory physical-plan audit.

Builds every declared query's executed plan at a small SF and reports the
plan-quality metrics the 100 TB story depends on:

- exchanges (shuffle count), broadcast vs sort-merge joins,
- scan pushdown (PushedFilters / PartitionFilters present where expected),
- scale-killer patterns: CartesianProduct, BroadcastNestedLoopJoin, and
  data-sized single-partition windows (`Window.orderBy` with no
  partitioning is ONE task — only calendar/dimension-bounded frames may
  use it, and those are allow-listed below).

Output: PLANS.json (per-query metrics) + a summary line. Non-zero exit if
a scale-killer appears outside the allow-lists, so this doubles as a
regression gate (tests/test_plan_report.py runs it).

Usage: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

# Queries allowed to contain a partition-less Window in the PHYSICAL plan:
# every entry must be bounded by something that does NOT grow with the
# corpus (bucket count, calendar, dimension size, cluster partition
# count). Growing this list requires the same justification in the
# query's docstring.
GLOBAL_WINDOW_OK = {
    # partition-count-bounded offsets frames (operators/rank.py) —
    # ≤ nparts rows by construction:
    "q107_quality_deciles",
    "q114_shard_planning",
    "q121_pps_sample",
    "q136_decile_lift",
    "q140_peak_concurrency",
    # bucket-/calendar-/dimension-bounded frames:
    "q108_value_histogram",   # NB=12 buckets
    "q119_rank_functions",    # 25 nations
    "q134_wow_growth",        # weeks per event_type (PARTITION BY type)
    "q139_contribution_shares",  # 25 nations
    "q141_adoption_curve",    # days
    # oracle-exact global orderings documented as verification-scale:
    "q52_scd2_intervals",
}

# BroadcastNestedLoopJoin classification: the engine's ONLY sanctioned
# BNLJ is the scalar-augment pattern — crossJoin(broadcast(<1-row agg>)),
# which Spark plans as 'BroadcastNestedLoopJoin BuildLeft/Right, Cross'.
# That shape is scale-free (the build side is one aggregate row) and is
# how a scalar subquery joins in. Any BNLJ with a NON-Cross join type
# (inner/outer with a non-equi condition) is a real nested loop over
# data-sized sides and is flagged. Queries that legitimately need one go
# here with a justification; the set is empty by design.
BNLJ_OK: set[str] = set()

_BNLJ_CROSS = re.compile(r"BroadcastNestedLoopJoin Build(Left|Right), Cross")
_BNLJ_ANY = re.compile(r"BroadcastNestedLoopJoin Build(Left|Right), (\w+)")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from wetsa_cams_solrad_timeseries_spark.plans.registry import QUERIES
    from wetsa_cams_solrad_timeseries_spark.session import get_spark

    spark = get_spark("plan-report")
    report: dict[str, dict] = {}
    violations: list[str] = []
    for name, spec in QUERIES.items():
        try:
            plan = (
                spec.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001
            report[name] = {"error": str(ex)[:200]}
            violations.append(f"{name}: plan build failed: {ex}")
            continue
        # Single-partition window detection, LINE-based: in the printed
        # physical tree a Window node consuming an `Exchange
        # SinglePartition` child sits a few lines ABOVE it (with only
        # Sort / codegen chrome in between). Character-proximity regexes
        # false-negative the moment a Window's expression list exceeds
        # the proximity budget — one long line defeats them; line
        # adjacency is length-independent.
        lines = plan.splitlines()
        single_part_window = False
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            for back in range(1, 5):
                if i - back < 0:
                    break
                up = lines[i - back]
                if "Window" in up:
                    single_part_window = True
                    break
                # Only sort/codegen chrome may sit between a Window and
                # its exchange; anything else means this exchange feeds
                # a different operator.
                if not any(
                    t in up
                    for t in ("Sort", "WholeStageCodegen", "InputAdapter", "*(")
                ):
                    break
            if single_part_window:
                break
        bnlj_types = [m.group(2) for m in _BNLJ_ANY.finditer(plan)]
        bnlj_noncross = [t for t in bnlj_types if t != "Cross"]
        metrics = {
            "exchanges": plan.count("Exchange"),
            "broadcast_joins": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "shj": plan.count("ShuffledHashJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "bnlj_scalar_cross": len(bnlj_types) - len(bnlj_noncross),
            "bnlj_noncross": len(bnlj_noncross),
            "python_kernels": plan.count("InPandas")
            + plan.count("ArrowEvalPython"),
            "codegen_spans": plan.count("WholeStageCodegen"),
            "single_partition_window": single_part_window,
            "pushed_filters": "PushedFilters: [" in plan
            and "PushedFilters: []" not in plan,
        }
        report[name] = metrics
        if metrics["cartesian"]:
            violations.append(f"{name}: CartesianProduct in plan")
        if metrics["bnlj_noncross"] and name not in BNLJ_OK:
            violations.append(
                f"{name}: non-Cross BroadcastNestedLoopJoin "
                f"({bnlj_noncross}) in plan"
            )
        if single_part_window and name not in GLOBAL_WINDOW_OK:
            violations.append(
                f"{name}: data-sized single-partition Window (not on the "
                f"bounded allow-list)"
            )

    out = {
        "sf_dir": sf_dir,
        "n_queries": len(report),
        "violations": violations,
        "queries": report,
    }
    with open("PLANS.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    n_bad = len(violations)
    print(
        f"plan report: {len(report)} queries, "
        f"{sum(m.get('exchanges', 0) for m in report.values())} exchanges "
        f"total, {n_bad} violations -> PLANS.json"
    )
    for v in violations:
        print("VIOLATION:", v)
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
