"""Declared schemas for the test corpus (FIXTURES.md F6) and schema
assertion — SURVEY.md §1.3: the reference infers schemas per file and
probes columns at runtime; this engine DECLARES them (M0) so a drifting
input fails loudly instead of silently widening a type.

``events.ts`` is declared as it arrives under the nanos-as-long reading
(LongType); `catalog.table` converts to TimestampType — both shapes are
accepted by the validator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


CORPUS_SCHEMAS: dict[str, T.StructType] = {
    "region": _s(("r_regionkey", T.IntegerType()), ("r_name", T.StringType())),
    "nation": _s(
        ("n_nationkey", T.IntegerType()),
        ("n_name", T.StringType()),
        ("n_regionkey", T.IntegerType()),
    ),
    "customer": _s(
        ("c_custkey", T.LongType()),
        ("c_name", T.StringType()),
        ("c_nationkey", T.IntegerType()),
        ("c_acctbal", T.DoubleType()),
        ("c_mktsegment", T.StringType()),
    ),
    "supplier": _s(
        ("s_suppkey", T.LongType()),
        ("s_name", T.StringType()),
        ("s_nationkey", T.IntegerType()),
        ("s_acctbal", T.DoubleType()),
    ),
    "part": _s(
        ("p_partkey", T.LongType()),
        ("p_name", T.StringType()),
        ("p_brand", T.StringType()),
        ("p_type", T.StringType()),
        ("p_size", T.IntegerType()),
        ("p_retailprice", T.DoubleType()),
    ),
    "orders": _s(
        ("o_orderkey", T.LongType()),
        ("o_custkey", T.LongType()),
        ("o_orderstatus", T.StringType()),
        ("o_totalprice", T.DoubleType()),
        ("o_orderdate", T.TimestampType()),
        ("o_orderpriority", T.StringType()),
    ),
    "lineitem": _s(
        ("l_orderkey", T.LongType()),
        ("l_partkey", T.LongType()),
        ("l_suppkey", T.LongType()),
        ("l_linenumber", T.IntegerType()),
        ("l_quantity", T.DoubleType()),
        ("l_extendedprice", T.DoubleType()),
        ("l_discount", T.DoubleType()),
        ("l_tax", T.DoubleType()),
        ("l_returnflag", T.StringType()),
        ("l_linestatus", T.StringType()),
        ("l_shipdate", T.TimestampType()),
    ),
    "events": _s(
        ("event_id", T.LongType()),
        ("ts", T.TimestampType()),  # post-catalog conversion; raw read is long nanos
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ),
    "documents": _s(
        ("doc_id", T.LongType()),
        ("text", T.StringType()),
        ("lang", T.StringType()),
        ("source", T.StringType()),
        ("n_chars", T.LongType()),
    ),
    "embeddings": _s(
        ("vec_id", T.LongType()),
        ("embedding", T.ArrayType(T.FloatType())),
        ("label", T.IntegerType()),
    ),
}

# Types Spark may substitute depending on reader flags, accepted as equal.
_EQUIVALENT = {
    (T.TimestampType(), T.TimestampNTZType()),
    (T.TimestampNTZType(), T.TimestampType()),
}


def validate_schema(df: DataFrame, table_name: str) -> None:
    """P8 generalized: assert the DataFrame matches the declared corpus
    schema (names, order, and types up to timestamp-NTZ equivalence)."""
    expected = CORPUS_SCHEMAS[table_name]
    actual = df.schema
    if [f.name for f in actual.fields] != [f.name for f in expected.fields]:
        raise ValueError(
            f"{table_name}: column mismatch: "
            f"{[f.name for f in actual.fields]} != {[f.name for f in expected.fields]}"
        )
    for a, e in zip(actual.fields, expected.fields):
        if a.dataType != e.dataType and (a.dataType, e.dataType) not in _EQUIVALENT:
            raise ValueError(
                f"{table_name}.{a.name}: type {a.dataType} != declared {e.dataType}"
            )
