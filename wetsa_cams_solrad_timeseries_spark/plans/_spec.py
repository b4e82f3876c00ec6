"""Shared QuerySpec constructor (avoids a circular import with registry)
and the structural cross-engine rounding helpers.

Every multi-row float aggregate that reaches a query's output MUST round
via ``round6``/``round6_sql`` — the +1e-9 nudge relocates rounding-grid
ties off values the decimal-resolution data can produce, so Spark and
DuckDB always round the same way (see registry docstring for the
measured flake data). These helpers make the convention code instead of
copy-discipline: use them in every new plan; a nudge-less 6-digit round
in a plans/ file is a bug (tests/test_registry.py enforces this).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def round6(col: Column | str) -> Column:
    """Spark side of the cross-engine rounding convention."""
    if isinstance(col, str):
        col = F.col(col)
    return F.round(col + F.lit(1e-9), 6)


def round6_sql(expr: str) -> str:
    """DuckDB-oracle side of the cross-engine rounding convention."""
    return f"round({expr} + 1e-9, 6)"


# Money sums: the corpus carries 2-decimal money data, so money
# expressions (price, price*(1-disc), price*(1-disc)*(1+tax), …) have ≤6
# exact decimal digits and cast to DECIMAL(27,6) losslessly. Summing the
# decimals is associative-EXACT in both Spark and DuckDB, which makes the
# aggregate independent of partitioning / join order / merge order —
# round6 alone cannot do that once the per-group sum magnitude reaches
# ~1e8 (double sum order variance ~1e-7+ straddles the 1e-6 rounding
# grid; q81's bucketed SMJ reorder turned exactly this into a red driver
# row in round 3). Also the 100-TB-right form: group sums reach 1e13+
# there, where a double sum has NO stable 6th decimal at all.
_MONEY_DEC = "decimal(27,6)"


def exact_sum(col: Column | str) -> Column:
    """Order-independent money sum (Spark side): exact decimal internally,
    double out so result schemas stay unchanged."""
    if isinstance(col, str):
        col = F.col(col)
    return F.sum(col.cast(_MONEY_DEC)).cast("double")


def exact_sum_sql(expr: str) -> str:
    """DuckDB-oracle twin of :func:`exact_sum`."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ids: tuple[str, ...] = field(default=())
    doc: str = ""
    # Optional sf-aware oracle builder for queries whose oracle embeds
    # data-derived literals (q56's trained centroids): ``oracle`` stays
    # the static string the driver runs at ITS gate SF; local checkers
    # call ``oracle_fn(sf_dir)`` to regenerate for any other SF.
    oracle_fn: Callable[[str], str | None] | None = None

    def oracle_for(self, sf_dir: str) -> str | None:
        return self.oracle_fn(sf_dir) if self.oracle_fn else self.oracle


def make_specs(rows) -> dict[str, QuerySpec]:
    return {
        name: QuerySpec(fn=fn, oracle=oracle, survey_ids=tuple(ids), doc=doc)
        for name, fn, oracle, ids, doc in rows
    }
