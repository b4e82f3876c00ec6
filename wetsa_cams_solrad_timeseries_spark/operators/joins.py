"""Join operators: dimension lookup (J2), timestamp equi-join (J1),
key-normalized join (J3), and the as-of join the reference lacks but a
time-series engine needs.

Scale notes (100 TB):
- Dimension joins broadcast the small side explicitly — zero shuffle on
  the fact table, and the exclude/membership guards of the reference
  (P6/P7) ride on the same join instead of being driver-side loops.
- The timestamp join shuffles both sides on the join key; when one side is
  a per-bucket aggregate it is usually broadcastable and AQE demotes to
  broadcast at runtime.
- The as-of join is the union–sort–carry-forward formulation: ONE shuffle
  + sort per side keyed by the `by` columns, no range explosion, no
  per-key driver loop. Skewed `by` keys are handled by AQE skew-join since
  the heavy op is a window sort, and can additionally be salted upstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.functions.scalar import clean_key


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """J2 — broadcast hash join of a fact table against a small dimension.

    Reference: code/compile-solrad.py:97,143-144 (``locations_df.loc[key]``
    per-file probes) → one broadcast join. With ``how='inner'`` the
    membership filter (P7, code/compile-solrad.py:92-94) is implicit.
    """
    on = [on] if isinstance(on, str) else list(on)
    return fact.join(F.broadcast(dim), on=on, how=how)


def key_normalized_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    key_col: str = "join_key",
    how: str = "inner",
) -> DataFrame:
    """J3 — join after applying the station-name normalization (F6) to both
    sides, as the reference does before every metadata lookup
    (reference: code/compile-solrad.py:49,84)."""
    f = fact.withColumn(key_col, clean_key(fact_key))
    d = dim.withColumn(key_col, clean_key(dim_key))
    return dim_join(f, d.drop(dim_key), on=key_col, how=how)


def timestamp_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    how: str = "inner",
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """J1 — exact-match equi-join on a timestamp (+ optional keys).

    Reference: code/solrad-compare.py:80 (``pd.merge`` on the
    DatetimeIndex). Many-to-many duplicate-timestamp semantics match
    Spark's join semantics exactly.
    """
    return left.join(right, on=[*extra_keys, ts_col], how=how)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    by: Sequence[str],
    bucket: str = "7 days",
) -> DataFrame:
    """Interval/range join: pair each left row with every right interval
    ``[start, end)`` of the same ``by`` group containing its timestamp.

    Spark has no native band join; the naive formulation is a cross join
    with an inequality filter (quadratic per key). This operator uses the
    standard bucketization: intervals explode into the fixed-width time
    buckets they overlap, the join is an EQUI-join on (by, bucket), and
    the exact inequality filters the bucket-level candidates. Cost is
    |L| + |R|·(interval/bucket) join rows instead of |L|·|R| per key —
    pick ``bucket`` near the typical interval length.

    AQE's skew handling applies to hot (by, bucket) pairs; extreme
    long-tail intervals can be capped by splitting them upstream.
    """
    import pandas as pd

    by = list(by)
    # Bucket width resolved driver-side to plain seconds: fixed-length
    # intervals only ('7 days', '12 hours' — not calendar months), and
    # independent of the session timezone (an epoch+interval unix_timestamp
    # derivation would shift under a non-UTC session).
    wsec = F.lit(int(pd.Timedelta(bucket).total_seconds()))

    lb = left.withColumn("__bucket", F.floor(F.unix_timestamp(F.col(left_ts)) / wsec))
    rb = right.withColumn(
        "__buckets",
        F.sequence(
            F.floor(F.unix_timestamp(F.col(right_start)) / wsec),
            F.floor(F.unix_timestamp(F.col(right_end)) / wsec),
        ),
    ).withColumn("__bucket", F.explode("__buckets")).drop("__buckets")
    joined = lb.join(rb, on=[*by, "__bucket"]).drop("__bucket")
    return joined.filter(
        (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) < F.col(right_end))
    )


def _guard_internal_names(op: str, cols, reserved: tuple[str, ...]) -> None:
    """The union–sort–carry implementations stage data through internal
    working columns; an input column with one of those names (or the
    ``__r_`` payload prefix) would silently duplicate inside the plan and
    surface as AMBIGUOUS_REFERENCE far from the call site — reject it
    here with a clear error instead."""
    bad = sorted(
        c for c in cols if c in reserved or c.startswith("__r_")
    )
    if bad:
        raise ValueError(
            f"{op}: column name(s) {bad} collide with the operator's "
            "internal working columns; rename them before joining"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by: Sequence[str],
    right_cols: Sequence[str],
    how: str = "left",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the *latest* right row with
    ``right_ts <= left_ts`` within the same ``by`` group.

    Not in the reference (its comparison join is exact-match on an aligned
    grid — SURVEY.md §2.4), but essential for time-series workloads.

    Implementation — union + carry-forward, the shuffle-minimal plan:
      1. tag both inputs and union them on (by, ts) with right payload
         columns nulled on the left side;
      2. one window sort per `by` group ordered by (ts, tag) — right rows
         sort before left rows at equal ts so `<=` includes exact matches;
      3. ``last(col, ignorenulls=True)`` carries the right payload forward;
      4. keep only left rows.

    Cost: one shuffle of |L|+|R| rows keyed by `by` + a sort — strictly
    cheaper than the bucketized-range-join alternative when right rows are
    dense, and it never explodes row counts. Equivalent plan used by
    pandas ``merge_asof`` / QuestDB ASOF JOIN, distributed.

    ``tolerance`` (e.g. ``"365 days"``) nulls the carried right payload
    when the matched right row is older than ``left_ts − tolerance`` —
    pandas ``merge_asof(tolerance=...)`` semantics. Implemented by also
    carrying the matched right timestamp and gating every payload column
    on it, so it costs one extra carried column, no extra shuffle.

    The carry is ONE struct holding (matched ts, all payload columns), so
    every output column comes from the SAME right row — carrying columns
    independently with ``last(ignorenulls=True)`` would silently fill a
    NULL payload cell from an OLDER right row, mixing rows and diverging
    from ``merge_asof`` (which returns the matched row's NULL as-is).
    """
    by = list(by)
    lcols = [c for c in left.columns if c not in by and c != left_ts]
    # Guard the WHOLE left output namespace (payload + by keys + the ts
    # column): a right_col named like any of them would emit duplicate
    # output columns and fail later with AMBIGUOUS_REFERENCE instead of
    # this clear error.
    collisions = set(right_cols) & ({left_ts, *by, *lcols})
    if collisions:
        raise ValueError(
            f"asof_join: right_cols {sorted(collisions)} collide with left "
            "columns; alias one side before joining (no implicit suffixing)"
        )
    _guard_internal_names(
        "asof_join",
        {*left.columns, *right_cols, right_ts},
        ("__ts", "__tag", "__m"),
    )
    l_tagged = left.select(
        *by,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts"), F.col("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry_cols = list(right_cols)
    # One struct per right row: the struct is non-null on every right row
    # even when individual payload fields are NULL, so last(ignorenulls)
    # skips LEFT rows only — ts and payload always travel together.
    r_struct = F.when(
        F.col("__tag") == 0,
        F.struct(
            F.col("__ts").alias("__mts"),
            *[F.col(f"__r_{c}").alias(c) for c in carry_cols],
        ),
    )
    carried = unioned.select(
        *by,
        "__ts",
        "__tag",
        *lcols,
        F.last(r_struct, ignorenulls=True).over(w).alias("__m"),
    )
    out = carried.filter(F.col("__tag") == 1).drop("__tag")
    matched = F.col("__m").isNotNull()
    if tolerance is not None:
        matched = matched & (
            F.col("__m.__mts")
            >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        )
    out = out.select(
        *by,
        "__ts",
        *lcols,
        *[F.when(matched, F.col(f"__m.{c}")).alias(c) for c in carry_cols],
        matched.alias("__matched"),
    ).withColumnRenamed("__ts", left_ts)
    if how == "inner":
        out = out.filter(F.col("__matched"))
    return out.drop("__matched")


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by: Sequence[str],
    right_cols: Sequence[str],
    tolerance_seconds: float,
) -> DataFrame:
    """Nearest-neighbor temporal join: for each left row, attach the right
    row whose timestamp is CLOSEST in either direction (pandas
    ``merge_asof(direction='nearest')``), within ``tolerance_seconds``;
    ties prefer the backward (at-or-before) match.

    Same union–sort–carry plan as :func:`asof_join`, run in BOTH
    directions over one shuffle: a backward pass carries the latest prior
    right row forward, a forward pass (mirror frame) carries the earliest
    later right row backward, then a per-row comparison picks the nearer
    candidate. Cost is identical to a single as-of join — one shuffle of
    |L|+|R| keyed by ``by`` plus one sort serving both window frames; no
    row explosion, no range-bucketing.

    Output adds ``direction`` ('backward'/'forward', null when nothing is
    within tolerance) and ``gap_s`` (seconds to the match).

    Each direction carries ONE struct of (right ts, all payload columns),
    so every output column comes from the SAME right row — independent
    per-column ``last/first(ignorenulls=True)`` carries would backfill a
    NULL payload cell from a DIFFERENT (older/newer) right row, mixing
    payloads across rows and diverging from ``merge_asof`` semantics.
    """
    by = list(by)
    lcols = [c for c in left.columns if c not in by and c != left_ts]
    # Also reserve the operator's own output columns (direction, gap_s).
    collisions = set(right_cols) & (
        {left_ts, *by, *lcols, "direction", "gap_s"}
    )
    if collisions:
        raise ValueError(
            f"nearest_join: right_cols {sorted(collisions)} collide with "
            "left columns; alias one side before joining (no implicit "
            "suffixing)"
        )
    _guard_internal_names(
        "nearest_join",
        {*left.columns, *right_cols, right_ts},
        ("__ts", "__tag", "__b", "__f"),
    )
    l_tagged = left.select(
        *by,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in lcols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in right_cols
        ],
    )
    r_tagged = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at equal ts, so an exact-timestamp
    # match lands in the backward frame with gap 0 (and wins every tie).
    order = [F.col("__ts"), F.col("__tag")]
    w_back = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # One struct per right row per direction: non-null on every right row
    # even when payload fields are NULL, so the carry skips LEFT rows
    # only and ts + payload always come from the same right row.
    r_struct = F.when(
        F.col("__tag") == 0,
        F.struct(
            F.col("__ts").alias("__rts"),
            *[F.col(f"__r_{c}").alias(c) for c in right_cols],
        ),
    )
    carried = unioned.select(
        *by,
        "__ts",
        "__tag",
        *lcols,
        F.last(r_struct, ignorenulls=True).over(w_back).alias("__b"),
        F.first(r_struct, ignorenulls=True).over(w_fwd).alias("__f"),
    ).filter(F.col("__tag") == 1)
    ts_d = F.col("__ts").cast("double")
    gap_b = ts_d - F.col("__b.__rts").cast("double")
    gap_f = F.col("__f.__rts").cast("double") - ts_d
    b_ok = F.col("__b").isNotNull() & (gap_b <= tolerance_seconds)
    f_ok = F.col("__f").isNotNull() & (gap_f <= tolerance_seconds)
    choose_b = b_ok & (~f_ok | (gap_b <= gap_f))
    choose_f = f_ok & ~choose_b
    out = carried.select(
        *by,
        F.col("__ts").alias(left_ts),
        *lcols,
        *[
            F.when(choose_b, F.col(f"__b.{c}"))
            .when(choose_f, F.col(f"__f.{c}"))
            .alias(c)
            for c in right_cols
        ],
        F.when(choose_b, F.lit("backward"))
        .when(choose_f, F.lit("forward"))
        .alias("direction"),
        F.when(choose_b, gap_b).when(choose_f, gap_f).alias("gap_s"),
    )
    return out
