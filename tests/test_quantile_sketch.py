"""q191 digest invariants: the property that makes the sketch
distributed-friendly is that per-shard digests merge LOSSLESSLY — the
merged digest is bit-identical to the digest built over the union in one
pass, so a 1000-executor rollup can build shard digests independently
and still answer global quantiles exactly as a single-pass build would."""

from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table
from wetsa_cams_solrad_timeseries_spark.plans.advanced import (
    _Q191_BIN_W,
    q191_quantile_sketch_merge,
)


def _digest_rows(df, shard_col=None):
    """(bin → (weight, decimal sum)) digest, optionally via a shard level."""
    binned = df.select(
        F.year("l_shipdate").alias("shard"),
        F.floor(F.col("l_extendedprice") / F.lit(_Q191_BIN_W))
        .cast("int")
        .alias("bin"),
        "l_extendedprice",
    )
    dec = F.col("l_extendedprice").cast("decimal(27,6)")
    if shard_col:
        per_shard = binned.groupBy("shard", "bin").agg(
            F.count(F.lit(1)).alias("w"), F.sum(dec).alias("s")
        )
        merged = per_shard.groupBy("bin").agg(
            F.sum("w").alias("w"), F.sum("s").alias("s")
        )
    else:
        merged = binned.groupBy("bin").agg(
            F.count(F.lit(1)).alias("w"), F.sum(dec).alias("s")
        )
    return {
        r["bin"]: (r["w"], str(r["s"])) for r in merged.collect()
    }


def test_merged_shard_digests_equal_single_pass_digest(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    via_shards = _digest_rows(li, shard_col="shard")
    single_pass = _digest_rows(li)
    assert via_shards == single_pass
    assert len(single_pass) <= 110  # grid-bounded: the 100 TB claim


def test_estimates_within_one_bin_of_exact(spark, sf_dir):
    rows = q191_quantile_sketch_merge(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        # Centroid mean of the picked bin is within one bin width of the
        # exact percentile — the accuracy bound a fixed-grid digest owes.
        assert abs(r["est_sketch"] - r["exact_pct"]) <= _Q191_BIN_W


def test_streaming_digest_equals_batch_sketch(spark, sf_dir):
    # q252's contract: per-micro-batch digests merged at read-off equal
    # the one-pass batch sketch row for row — batch boundaries cannot
    # change a losslessly-mergeable summary.
    from wetsa_cams_solrad_timeseries_spark.plans.advanced import (
        q191_quantile_sketch_merge,
        q252_streaming_quantile_digest,
    )

    streamed = sorted(
        tuple(r)
        for r in q252_streaming_quantile_digest(spark, sf_dir).collect()
    )
    batch = sorted(
        tuple(r) for r in q191_quantile_sketch_merge(spark, sf_dir).collect()
    )
    assert streamed and streamed == batch
