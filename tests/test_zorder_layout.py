"""Z-order layout (q120) actually earns its keep: after a sort-write by
the Morton key, per-file column statistics (the same min/max envelopes
parquet footers carry and every lakehouse reader prunes against) become
narrow in BOTH interleaved dimensions — so a two-dimensional rectangle
predicate can skip most files. An unclustered write of the same rows
cannot skip any.

This is footer-level math (pyarrow metadata), not a Spark-metrics
assertion — i.e. it proves the property any engine's reader would
exploit, not a Spark implementation detail.
"""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table
from wetsa_cams_solrad_timeseries_spark.plans.curation import _zvalue


def _file_envelopes(path_glob):
    """Per-file (min, max) stats for columns a and b from parquet footers."""
    out = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.read_metadata(f)
        if md.num_rows == 0:
            continue
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo_a = hi_a = lo_b = hi_b = None
        for rg in range(md.num_row_groups):
            sa = md.row_group(rg).column(idx["a"]).statistics
            sb = md.row_group(rg).column(idx["b"]).statistics
            lo_a = sa.min if lo_a is None else min(lo_a, sa.min)
            hi_a = sa.max if hi_a is None else max(hi_a, sa.max)
            lo_b = sb.min if lo_b is None else min(lo_b, sb.min)
            hi_b = sb.max if hi_b is None else max(hi_b, sb.max)
        out.append((lo_a, hi_a, lo_b, hi_b))
    return out


def _candidates(envelopes, a_hi=32, b_hi=32):
    """Files whose envelope intersects the rectangle a<32 AND b<32."""
    return sum(1 for lo_a, _, lo_b, _ in envelopes if lo_a < a_hi and lo_b < b_hi)


def test_zorder_sort_write_prunes_both_dimensions(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events")
    a = (F.col("user_id") % 256).cast("int")
    b = F.least(
        F.lit(255), F.greatest(F.lit(0), F.floor(F.col("value") * 2.55))
    ).cast("int")
    rows = ev.select(a.alias("a"), b.alias("b"))
    keyed = rows.withColumn("z", _zvalue(F.col("a"), F.col("b")))

    zdir, udir = str(tmp_path / "zorder"), str(tmp_path / "unsorted")
    (
        keyed.repartitionByRange(16, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(zdir)
    )
    keyed.repartition(16).write.mode("overwrite").parquet(udir)

    env_z = _file_envelopes(f"{zdir}/part-*.parquet")
    env_u = _file_envelopes(f"{udir}/part-*.parquet")
    assert len(env_z) >= 8 and len(env_u) >= 8  # real multi-file layouts

    cand_z, cand_u = _candidates(env_z), _candidates(env_u)
    # Hash-partitioned files all contain small a AND small b values →
    # nothing can be skipped.
    assert cand_u == len(env_u), (cand_u, len(env_u))
    # The z-sorted layout confines the low corner to a few leading files.
    assert cand_z <= len(env_z) // 4, (
        f"z-order layout should prune ≥75% of files for the 32×32 "
        f"corner rectangle, kept {cand_z}/{len(env_z)}"
    )

    # And the layouts agree on the answer (pruning is lossless).
    n_z = (
        spark.read.parquet(zdir)
        .filter((F.col("a") < 32) & (F.col("b") < 32))
        .count()
    )
    n_u = (
        spark.read.parquet(udir)
        .filter((F.col("a") < 32) & (F.col("b") < 32))
        .count()
    )
    assert n_z == n_u
