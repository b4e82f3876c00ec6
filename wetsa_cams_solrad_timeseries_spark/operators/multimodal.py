"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted through Arrow-batched Pandas UDFs.

The engine treats images/audio/video as what they are at 100 TB: opaque
bytes in a ``binary`` column plus a typed metadata struct, processed by
``mapInPandas`` so each task handles an Arrow batch of payloads without
ever materializing them on the driver.

Decode is REAL for the simple public containers — BMP / PPM / 8-bit PNG
and PCM WAV parse dependency-free (functions/media.py: struct + zlib) —
so ``decode_image``/``decode_audio`` execute end-to-end in this
environment. Codec-bound formats (JPEG, MP3, video) need libraries not
present here (Pillow / torchaudio / ffmpeg); those rows get a per-row
``err`` marker instead of a task failure (the ingest pipeline's O2
error-isolation contract), and wiring a codec library in is a
dispatch-table entry. ``extract_features``'s byte statistics remain the
format-agnostic "decode and embed" stand-in.
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
            # NULL payloads arrive as None — treat as empty bytes; a bare
            # np.frombuffer(None) would fail the whole task, violating the
            # per-row error-isolation contract (O2).
            arrs = [
                np.frombuffer(b if b is not None else b"", dtype=np.uint8)
                for b in pdf["payload"]
            ]
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


IMAGE_SCHEMA = (
    "doc_id long, format string, width long, height long, channels long, "
    "mean_pixel double, err string"
)
AUDIO_SCHEMA = (
    "doc_id long, format string, n_channels long, sample_rate long, "
    "n_frames long, duration_s double, rms double, err string"
)


def decode_image(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode image payloads to (width, height, channels, mean_pixel),
    Arrow-batched. BMP/PPM/PNG decode for REAL via the dependency-free
    parsers (functions/media.py — fixed public layouts, struct+zlib);
    codec-bound formats (JPEG) and unknown bytes produce a per-ROW
    ``err`` marker, never a task failure — the same error-isolation
    contract as the ingest pipeline (O2). Swapping in Pillow for the
    codec formats is a dispatch-table entry, not a rewrite."""
    from wetsa_cams_solrad_timeseries_spark.functions import media

    parsers = {"bmp": media.parse_bmp, "ppm": media.parse_ppm, "png": media.parse_png}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                # None payload → per-row err, never a task failure (O2).
                data = b"" if payload is None else bytes(payload)
                fmt = media.sniff_format(data)
                row = {
                    "doc_id": int(doc_id), "format": fmt, "width": None,
                    "height": None, "channels": None, "mean_pixel": None,
                    "err": None,
                }
                parser = parsers.get(fmt)
                if parser is None:
                    row["err"] = f"codec required for {fmt}"
                else:
                    try:
                        row.update(parser(data))
                    except Exception as ex:  # noqa: BLE001 — per-ROW err
                        # contract (O2): corrupt payloads (zlib.error on a
                        # truncated IDAT, IndexError on short scanlines,
                        # struct.error on bad headers) must mark the row,
                        # never fail the task.
                        row["err"] = f"{type(ex).__name__}: {ex}"
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=IMAGE_SCHEMA)


def decode_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode audio payloads (PCM WAV for real; compressed formats get a
    per-row ``err``) to channel/rate/duration/RMS — same contract as
    :func:`decode_image`."""
    from wetsa_cams_solrad_timeseries_spark.functions import media

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                data = b"" if payload is None else bytes(payload)
                fmt = media.sniff_format(data)
                row = {
                    "doc_id": int(doc_id), "format": fmt, "n_channels": None,
                    "sample_rate": None, "n_frames": None, "duration_s": None,
                    "rms": None, "err": None,
                }
                if fmt != "wav":
                    row["err"] = f"codec required for {fmt}"
                else:
                    try:
                        row.update(media.parse_wav(data))
                        row.pop("bits", None)
                    except Exception as ex:  # noqa: BLE001 — see decode_image
                        row["err"] = f"{type(ex).__name__}: {ex}"
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=AUDIO_SCHEMA)


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


DHASH_GRID = 8  # 8x8 comparison grid -> 64-bit difference hash
DHASH_BANDS = 4  # 4 x 16-bit bands for Hamming-LSH candidate pairing


def dhash_bands(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Perceptual difference hash (dHash, Krawetz 2013) over a binary
    payload, emitted as 4 x 16-bit band integers — the image-dedup twin
    of the q33/q34 signature discipline: the 64-bit gradient hash is
    split into bands so near-duplicates (small Hamming distance) collide
    on >=1 band by pigeonhole, and candidate pairing becomes a plain
    band-value equi-join instead of an all-pairs Hamming scan.

    Pixel source: a real image pipeline resizes the decoded image to a
    (GRID x GRID+1) grayscale thumbnail; this environment has no image
    corpus or codec libs, so the deterministic stand-in samples the
    payload BYTES into the 8x9 grid (pixel[r][c] = byte[(r*9+c) mod n],
    zero for empty payloads) — the hash algebra, banding, Arrow batch
    shape, and join plan are exactly the production ones, and swapping
    in a thumbnail resize is one kernel line. Bit k (k = r*8+c) is
    1 iff pixel[r][c] < pixel[r][c+1]; band b packs bits b*16..b*16+15
    little-endian, so every value fits untruncated in an int64.

    One Arrow kernel pass, no shuffle — signatures are 4 ints per
    payload regardless of payload size, which is the 100 TB point.
    """
    import numpy as np

    grid, bands = DHASH_GRID, DHASH_BANDS
    cols, bits_per_band = grid + 1, grid * grid // bands

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(bits_per_band, dtype=np.int64)
        for pdf in batches:
            out_bands = np.zeros((len(pdf), bands), dtype=np.int64)
            for i, payload in enumerate(pdf[payload_col]):
                arr = np.frombuffer(
                    payload if payload is not None else b"", dtype=np.uint8
                )
                if len(arr):
                    p = arr[np.arange(grid * cols) % len(arr)].astype(np.int64)
                else:
                    p = np.zeros(grid * cols, dtype=np.int64)
                P = p.reshape(grid, cols)
                bits = (P[:, :grid] < P[:, 1:]).astype(np.int64).ravel()
                out_bands[i] = bits.reshape(bands, bits_per_band) @ weights
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    **{f"band{b}": out_bands[:, b] for b in range(bands)},
                }
            )

    band_schema = ", ".join(f"band{b} long" for b in range(bands))
    return df.mapInPandas(kernel, schema=f"{id_col} long, {band_schema}")


def dhash_hamming_pairs(
    sig_df: DataFrame, id_col: str = "doc_id", max_hamming: int = 6
) -> DataFrame:
    """Near-duplicate pairs from dHash band signatures: candidates =
    distinct id pairs sharing >=1 band value (the banded equi-join —
    guaranteed recall for Hamming <= DHASH_BANDS-1 by pigeonhole, the
    documented LSH trade-off above it), then the EXACT 64-bit Hamming
    distance verified on candidates only (sum of per-band popcounts of
    XOR) and thresholded. Output: (id_a, id_b, hamming), id_a < id_b.

    Scale shape: band self-join keys are 16-bit values + band index —
    corpus-linear candidate generation; the verify join touches only
    candidate rows (q62's candidates-then-verify discipline)."""
    bands = [c for c in sig_df.columns if c.startswith("band")]
    stacked = sig_df.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(c).alias("val"))
                for b, c in enumerate(bands)
            ])
        ).alias("__b"),
    ).select(id_col, "__b.band", "__b.val")
    cand = (
        stacked.select(F.col(id_col).alias("id_a"), "band", "val")
        .join(
            stacked.select(F.col(id_col).alias("id_b"), "band", "val"),
            on=["band", "val"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = sig_df.select(
        F.col(id_col).alias("id_a"), *[F.col(c).alias(f"{c}_a") for c in bands]
    )
    b_ = sig_df.select(
        F.col(id_col).alias("id_b"), *[F.col(c).alias(f"{c}_b") for c in bands]
    )
    hamming = None
    for c in bands:
        term = F.bit_count(F.col(f"{c}_a").bitwiseXOR(F.col(f"{c}_b")))
        hamming = term if hamming is None else hamming + term
    return (
        cand.join(a, on="id_a")
        .join(b_, on="id_b")
        .select("id_a", "id_b", hamming.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
