"""Dump ``explain("formatted")`` for declared queries to files.

Usage: python tools/dump_explain.py <out_dir> <suffix> <sf_dir> <query ...>

Writes ``<out_dir>/<qNN>_<suffix>.txt`` (short name prefix) for each
query — the optimization-round evidence files (plans/r13/). Building a
query's DataFrame may run setup jobs (eager localCheckpoints); the
explain captures the final assembled plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    from wetsa_cams_solrad_timeseries_spark.plans.registry import QUERIES
    from wetsa_cams_solrad_timeseries_spark.session import get_spark

    spark = get_spark("dump-explain")
    for name in names:
        spec = QUERIES[name]
        df = spec.fn(spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        short = name.split("_", 1)[0]
        path = os.path.join(out_dir, f"{short}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} explain(formatted) at {sf_dir}\n")
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")


if __name__ == "__main__":
    main()
