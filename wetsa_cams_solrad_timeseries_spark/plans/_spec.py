"""Shared QuerySpec constructor (avoids a circular import with registry)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ids: tuple[str, ...] = field(default=())
    doc: str = ""


def make_specs(rows) -> dict[str, QuerySpec]:
    return {
        name: QuerySpec(fn=fn, oracle=oracle, survey_ids=tuple(ids), doc=doc)
        for name, fn, oracle, ids, doc in rows
    }
