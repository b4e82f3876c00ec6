"""Scalar expression library (SURVEY.md §2.7) + array math + cross-engine hashing."""

from wetsa_cams_solrad_timeseries_spark.functions.scalar import (
    abs_bias,
    clean_key,
    display_name,
    interval_start,
    local_time,
    null_safe_ratio,
    parse_utc_offset,
    sanitize_filename,
    to_utc_timestamp_lenient,
    wh_per_min_to_w,
)
from wetsa_cams_solrad_timeseries_spark.functions.hashing import (
    md5_hex,
    hash32,
    hash32_py,
)
from wetsa_cams_solrad_timeseries_spark.functions.arrays import (
    cosine_similarity,
    dot_product,
    l2_norm,
    to_double_array,
)

__all__ = [
    "abs_bias",
    "clean_key",
    "cosine_similarity",
    "display_name",
    "dot_product",
    "hash32",
    "hash32_py",
    "interval_start",
    "l2_norm",
    "local_time",
    "md5_hex",
    "null_safe_ratio",
    "parse_utc_offset",
    "sanitize_filename",
    "to_double_array",
    "to_utc_timestamp_lenient",
    "wh_per_min_to_w",
]
