"""Cross-engine deterministic hashing.

The dedup / fingerprint / LSH operators need a hash function that produces
*identical* values in Spark, in the DuckDB correctness oracle, and in plain
Python test oracles. Engine-native hashes (Spark ``xxhash64``, DuckDB
``hash``) differ across engines, so the portable primitive is MD5 — a
standard algorithm with bit-identical output everywhere — truncated to a
32-bit integer:

    hash32(s) = int(md5(s).hexdigest()[:8], 16)          # Python
              = conv(substring(md5(s),1,8),16,10)::long   # Spark SQL
              = cast('0x'||substr(md5(s),1,8) as bigint)  # DuckDB

MD5 is ~3× slower than xxhash64 but still JVM-side, codegen'd, and far from
the bottleneck in shingle pipelines (the shuffle is). For a pure-Spark
deployment where oracle parity is not needed, swap ``hash32`` for
``F.xxhash64`` — call sites take a Column-builder.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(col: Column) -> Column:
    """MD5 hex digest (lowercase, 32 chars) — identical in every engine."""
    return F.md5(col)


def hash32(col: Column) -> Column:
    """First 32 bits of MD5 as a non-negative bigint in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash32_py(s: str) -> int:
    """Python twin of :func:`hash32` for test oracles and driver-side code."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def hash32_sql_duckdb(expr: str) -> str:
    """DuckDB twin of :func:`hash32` as a SQL fragment (for oracle queries)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"
