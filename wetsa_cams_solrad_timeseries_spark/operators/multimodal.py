"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted through Arrow-batched Pandas UDFs.

The engine treats images/audio/video as what they are at 100 TB: opaque
bytes in a ``binary`` column plus a typed metadata struct, processed by
``mapInPandas`` so each task handles an Arrow batch of payloads without
ever materializing them on the driver.

The actual codec work (JPEG decode, resampling, frame extraction) needs
libraries not present in this environment (Pillow / torchaudio / ffmpeg)
— those steps are STUBBED: the import is attempted, and absent the
library the operator raises ``NotImplementedError`` (``decode_image``) or
falls back to a clearly-named deterministic fake (``extract_features``'s
byte statistics). The Spark-side contract — schemas, batch iteration,
partitioning — is real and tested; swapping the stub for Pillow is a
function-body change only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("last_byte", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
    ]
)


def attach_payload(
    df: DataFrame, id_col: str, text_col: str, content_type: str = "text/plain"
) -> DataFrame:
    """Turn a text column into the engine's canonical multimodal shape:
    ``(id, payload binary, meta struct<content_type, n_bytes>)``. Real
    image/audio ingestion lands bytes in exactly this shape via
    ``spark.read.format('binaryFile')``."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(content_type).alias("content_type"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload
    (mapInPandas). Features here are deterministic byte statistics — the
    stand-in for "decode and embed"; the batch shape, schema contract,
    and executor-side numpy work are the real thing."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            arrs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(a) for a in arrs],
                    "first_byte": [int(a[0]) if len(a) else -1 for a in arrs],
                    "last_byte": [int(a[-1]) if len(a) else -1 for a in arrs],
                    "byte_sum": [int(a.sum()) for a in arrs],
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def decode_image(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode image payloads to (height, width, channels) via Pillow.

    STUB: Pillow is not available in this environment; the Spark contract
    (mapInPandas over binary, struct output) is identical to
    ``extract_features`` — only the per-batch body differs."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - always taken here
        raise NotImplementedError(
            "image decode requires Pillow; payload plumbing is exercised via "
            "extract_features()"
        ) from exc
    raise NotImplementedError("wire Image.open over payload batches here")


def sample_frames(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Deterministic 'frame sampling' stand-in for video payloads: slice
    one byte every ``every_n_bytes`` as the sampled frame marker. Shows
    the explode-per-frame output shape a real sampler produces."""
    n = F.octet_length(F.col("payload"))
    idx = F.sequence(F.lit(1), F.greatest((n / every_n_bytes).cast("int"), F.lit(1)))
    return df.select(
        "doc_id",
        F.explode(
            F.transform(idx, lambda i: ((i - 1) * every_n_bytes + 1))
        ).alias("frame_offset"),
    )
