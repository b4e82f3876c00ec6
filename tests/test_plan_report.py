"""The whole-inventory plan audit (tools/plan_report.py) must stay
clean: no CartesianProduct, no non-Cross BroadcastNestedLoopJoin, and no
data-sized single-partition Window outside the bounded allow-list. Runs
the report in-process so regressions fail the suite, and leaves
PLANS.json refreshed."""

import sys


def test_plan_report_no_violations(spark, sf_dir):
    sys.path.insert(0, "/root/repo")
    import tools.plan_report as pr

    old_argv = sys.argv
    sys.argv = ["plan_report.py", sf_dir]
    try:
        rc = pr.main()
    finally:
        sys.argv = old_argv
    assert rc == 0, "plan audit reported violations — see PLANS.json"
