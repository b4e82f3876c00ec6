"""Scalar functions F1–F13 from SURVEY.md §2.7, as composable Column builders.

Every function here is a pure JVM-side expression (no Python UDFs) so the
whole chain stays inside whole-stage codegen and is pushdown/prune-friendly
at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def interval_start(col: Column | str) -> Column:
    """F1+F2 — parse the CAMS ``Observation period`` ISO interval string
    (``"start/end"``) and return the bucket-start timestamp.

    Reference: code/get-cams-solrad-ts.py:90 (``str.split('/').str[0]`` →
    ``pd.to_datetime``). Non-ANSI ``to_timestamp`` returns null on a bad
    parse, matching pandas ``errors='coerce'``.
    """
    return F.to_timestamp(F.split(_c(col), "/").getItem(0))


def to_utc_timestamp_lenient(col: Column | str, source_tz: str | None = None) -> Column:
    """F2+F3 — parse to timestamp with coerce-to-null; optionally convert
    from an explicit source timezone to UTC.

    Reference: code/solrad-compare.py:23-28 (naive → ``tz_localize('UTC')``,
    aware → ``tz_convert('UTC')``); code/compile-solrad.py:113
    (``errors='coerce'``). With ``spark.sql.session.timeZone=UTC`` a naive
    parse *is* the UTC localization.
    """
    ts = F.to_timestamp(_c(col))
    if source_tz is not None:
        ts = F.to_utc_timestamp(ts, source_tz)
    return ts


def parse_utc_offset(col: Column | str) -> Column:
    """F5 — ``'UTC+7'`` → 7 (int hours).

    Reference: code/compile-solrad.py:52 (``str.replace('UTC','')``
    ``.astype(int)``).
    """
    return F.regexp_replace(_c(col), "UTC", "").cast("int")


def local_time(ts: Column | str, offset_hours: Column | str) -> Column:
    """F4 — derive local time: ``time_utc + offset hours``.

    Reference: code/compile-solrad.py:115 (``pd.to_timedelta(offset,
    unit='h')`` addition). ``make_interval`` keeps this a column-level
    (per-row) offset, which a fixed-interval add could not express.
    """
    return _c(ts) + F.make_interval(hours=_c(offset_hours).cast("int"))


def clean_key(col: Column | str) -> Column:
    """F6/J3 — station-name normalization used as the join key on *both*
    sides of the metadata join: ``_``→space, strip non-alphanumerics,
    lowercase, collapse whitespace, trim.

    Reference: code/compile-solrad.py:11-23 (``clean_station_name``).
    """
    c = F.translate(_c(col), "_", " ")
    c = F.regexp_replace(c, r"[^a-zA-Z0-9\s]", "")
    c = F.lower(c)
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def clean_key_str(name: str) -> str:
    """Driver-side twin of :func:`clean_key` — SAME normalization, so
    literal exclusion/membership lists can be compared against
    ``clean_key``-derived join keys. A hand-rolled
    ``lower().replace('_',' ')`` misses the punctuation-strip and
    whitespace-collapse steps and silently fails to match (observed:
    'Mt. Merapi' → 'mt. merapi' vs clean_key's 'mt merapi')."""
    import re

    s = name.replace("_", " ")
    s = re.sub(r"[^a-zA-Z0-9\s]", "", s)
    s = re.sub(r"\s+", " ", s.lower())
    return s.strip()


# F7 pattern, shared by the Column form and the driver-side string form.
FILENAME_SANITIZE_PATTERN = r"[^\w\.-]"


def sanitize_filename(col: Column | str) -> Column:
    """F7 — replace filesystem-hostile characters with ``_``.

    Reference: code/get-cams-solrad-ts.py:137 (``re.sub(r'[^\\w\\.-]', '_')``).
    """
    return F.regexp_replace(_c(col), FILENAME_SANITIZE_PATTERN, "_")


def sanitize_filename_str(name: str) -> str:
    """Driver-side twin of :func:`sanitize_filename` (same pattern)."""
    import re

    return re.sub(FILENAME_SANITIZE_PATTERN, "_", name)


def wh_per_min_to_w(col: Column | str) -> Column:
    """F8 — CAMS Wh/m² *per-minute energy* → W/m² mean power (× 60).

    Reference: code/solrad-compare.py:61-66. Valid only because the raw
    resolution is 1 minute (BASELINE.md); the constant is intentional.
    """
    return _c(col) * F.lit(60.0)


def null_safe_ratio(num: Column | str, den: Column | str) -> Column:
    """F10 — ``num / den`` with a 0 denominator yielding null.

    Reference: code/solrad-compare.py:91 (``.replace(0, np.nan)`` before the
    division). ``nullif`` is explicit even though non-ANSI division would
    also null out — intent is visible in the plan.
    """
    return _c(num) / F.nullif(_c(den), F.lit(0))


def abs_bias(model: Column | str, truth: Column | str) -> Column:
    """F9+F11 — ``abs(model − truth)``.

    Reference: code/solrad-compare.py:88-90 (bias columns), :123 (abs for
    the scatter color scale).
    """
    return F.abs(_c(model) - _c(truth))


def display_name(col: Column | str) -> Column:
    """F13 — underscores → spaces for human-facing station names.

    Reference: code/solrad-compare.py:215; code/compile-solrad.py:88,93.
    """
    return F.translate(_c(col), "_", " ")
