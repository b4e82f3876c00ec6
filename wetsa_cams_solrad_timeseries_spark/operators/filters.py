"""Row filters: QC-flag predicate (P4), exclusion/membership (P6/P7),
null-drop (P5), schema guards (P8).

All pure Catalyst predicates → pushed into the parquet/CSV scan where
possible (the flag-sum predicate is a conjunction of column references, so
it prunes row groups via parquet min/max stats at scale).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce
from operator import add

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def qc_flag_filter(df: DataFrame, flag_cols: Sequence[str]) -> DataFrame:
    """P4+A2 — keep rows where the sum of the QC flag columns *that exist
    in the schema* is 0.

    Reference: code/solrad-compare.py:35-42 — the column-presence probe
    (``[c for c in flag_cols if c in df.columns]``) is schema introspection,
    kept driver-side; the NaN-skipping horizontal sum maps to
    ``coalesce(flag, 0)`` addition.
    """
    present = [c for c in flag_cols if c in df.columns]
    if not present:
        return df
    total = reduce(add, [F.coalesce(F.col(c), F.lit(0)) for c in present])
    return df.filter(total == 0)


def exclude_keys(df: DataFrame, key_col: str, excluded: Sequence[str]) -> DataFrame:
    """P6 — drop rows whose key is in a literal exclusion list.

    Reference: code/compile-solrad.py:87-89,207 (hard-coded ``Sleman``
    exclusion). A literal ``isin`` filter pushes to the scan; for a large
    exclusion table use a left-anti join instead (see ``anti_join_keys``).
    NULL keys are kept (a bare ``~isin`` would drop them via three-valued
    logic), matching the anti-join formulation.
    """
    key = F.col(key_col)
    return df.filter(~key.isin(list(excluded)) | key.isNull())


def anti_join_keys(df: DataFrame, keys: DataFrame, on: str) -> DataFrame:
    """P6 at scale — exclusion by left-anti join (broadcast when small)."""
    return df.join(F.broadcast(keys), on=on, how="left_anti")


def semi_join_keys(df: DataFrame, keys: DataFrame, on: str) -> DataFrame:
    """P7 — membership filter by left-semi join.

    Reference: code/compile-solrad.py:92-94 (skip files whose station is
    not in the locations index).
    """
    return df.join(F.broadcast(keys), on=on, how="left_semi")


def require_columns(df: DataFrame, required: Sequence[str]) -> None:
    """P8 — fail fast when required columns are missing.

    Reference: code/get-cams-solrad-ts.py:119-121.
    """
    missing = set(required) - set(df.columns)
    if missing:
        raise ValueError(f"missing required columns: {sorted(missing)}")
