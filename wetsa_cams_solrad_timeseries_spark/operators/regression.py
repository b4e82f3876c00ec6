"""OLS regression aggregates (B1/B2) — distributed scipy.linregress parity.

Reference: code/solrad-compare.py:131-132 runs ``scipy.stats.linregress``
per (station, component) on the driver. Spark ≥3.3 ships the SQL regression
aggregates (``regr_slope`` / ``regr_intercept`` / ``regr_r2`` /
``regr_count``), which compute the same closed-form OLS in one distributed
aggregation pass (map-side partials + one shuffle) — no scipy on executors,
no driver loop, group-parallel across stations.

p-value and stderr (the remaining two linregress outputs) are closed-form
functions of (r, n, slope): computed post-agg. The t→p conversion needs an
incomplete-beta function, which is driver-side-only scipy on a per-GROUP
(not per-row) result — a few hundred rows for thousands of stations.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def regression_agg(
    df: DataFrame,
    y: str,
    x: str,
    group_cols: Sequence[str] = (),
    round_digits: int | None = None,
    extended: bool = False,
) -> DataFrame:
    """Per-group OLS of ``y`` on ``x``: slope, intercept, r², n
    (+ ``sxx``/``syy`` sums of squares when ``extended`` — the inputs the
    closed-form stderr needs to stay finite at r²∈{0,1}).

    Null pairs are excluded by the regr_* aggregates themselves, matching
    the reference's pre-regression ``dropna`` (code/solrad-compare.py:126).
    """
    def _r(c: F.Column) -> F.Column:
        # +1e-9 boundary nudge — see plans/registry.py determinism rules:
        # keeps cross-engine ULP noise from flipping the rounded digit.
        if round_digits is None:
            return c
        return F.round(c + F.lit(1e-9), round_digits)

    yx = (F.col(y), F.col(x))
    aggs = [
        _r(F.regr_slope(*yx)).alias("slope"),
        _r(F.regr_intercept(*yx)).alias("intercept"),
        _r(F.regr_r2(*yx)).alias("r2"),
        F.regr_count(*yx).alias("n"),
    ]
    if extended:
        aggs += [
            F.regr_sxx(*yx).alias("sxx"),
            F.regr_syy(*yx).alias("syy"),
        ]
    return df.groupBy(*group_cols).agg(*aggs)


def with_stderr_pvalue(rows: list[dict]) -> list[dict]:
    """Driver-side closed-form stderr + two-sided p-value for each regression
    result row (dicts with slope, r2, n), matching scipy.linregress.

    stderr = slope * sqrt((1/r² − 1) / (n − 2));  t = slope / stderr;
    p = 2 · sf(|t|, df=n−2). Uses scipy when available (exact parity),
    else a normal approximation.
    """
    try:
        from scipy import stats  # type: ignore

        def sf(t: float, dof: int) -> float:
            return float(2.0 * stats.t.sf(abs(t), dof))
    except ImportError:  # pragma: no cover - scipy is present in dev images
        def sf(t: float, dof: int) -> float:
            return float(2.0 * 0.5 * math.erfc(abs(t) / math.sqrt(2.0)))

    out = []
    for row in rows:
        r2, n, slope = row.get("r2"), row.get("n", 0), row.get("slope")
        sxx, syy = row.get("sxx"), row.get("syy")
        enriched = dict(row)
        if r2 is None or slope is None or n is None or n <= 2:
            enriched["stderr"] = None
            enriched["p_value"] = None
        elif sxx is not None and syy is not None and sxx > 0:
            # Robust form, finite at r² ∈ {0, 1}:
            #   stderr = sqrt(syy·(1−r²) / (sxx·(n−2)))
            stderr = math.sqrt(max(syy * (1.0 - min(r2, 1.0)), 0.0) / (sxx * (n - 2)))
            t = slope / stderr if stderr > 0 else math.copysign(float("inf"), slope or 1.0)
            enriched["stderr"] = stderr
            enriched["p_value"] = 0.0 if stderr == 0 else sf(t, n - 2)
        elif 0 < r2 < 1:
            # Legacy slope-based form (no sums of squares available).
            stderr = abs(slope) * math.sqrt((1.0 / r2 - 1.0) / (n - 2))
            t = slope / stderr if stderr > 0 else float("inf")
            enriched["stderr"] = stderr
            enriched["p_value"] = sf(t, n - 2)
        elif r2 >= 1:
            enriched["stderr"] = 0.0  # exact fit: scipy yields stderr=0, p=0
            enriched["p_value"] = 0.0
        else:
            enriched["stderr"] = None
            enriched["p_value"] = None
        out.append(enriched)
    return out
