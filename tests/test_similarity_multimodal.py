"""Similarity search + multimodal plumbing + streaming twin vs numpy/pandas
oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.operators.multimodal import (
    attach_payload,
    decode_image,
    extract_features,
    sample_frames,
)
from wetsa_cams_solrad_timeseries_spark.operators.similarity import (
    brute_force_topk,
    hyperplane_buckets,
    hyperplane_coefs,
    neardup_pairs,
)


def _emb_df(spark, n=40, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs[1] = vecs[0] + 0.001 * rng.normal(size=dim).astype(np.float32)  # near-dup
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, vecs.astype(np.float64)


def _cos_matrix(vecs):
    n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    return n @ n.T


def test_brute_force_topk_matches_numpy(spark):
    df, vecs = _emb_df(spark)
    got = brute_force_topk(df, df.filter(F.col("vec_id") < 3), k=4).collect()
    C = _cos_matrix(vecs)
    for q in range(3):
        order = sorted(
            (i for i in range(len(vecs)) if i != q),
            key=lambda i: (-round(C[q, i] + 1e-9, 6), i),
        )[:4]
        got_q = sorted(
            ((r["rank"], r["neighbor_id"]) for r in got if r["query_id"] == q)
        )
        assert [n for _, n in got_q] == order


def test_neardup_pairs_finds_planted_pair(spark):
    df, vecs = _emb_df(spark)
    got = {(r["id_a"], r["id_b"]) for r in neardup_pairs(df, 0.99).collect()}
    assert (0, 1) in got
    C = _cos_matrix(vecs)
    exp = {
        (a, b)
        for a in range(len(vecs))
        for b in range(a + 1, len(vecs))
        if round(C[a, b] + 1e-9, 6) >= 0.99
    }
    assert got == exp


def test_neardup_pairs_lsh_subset_with_planted_pair(spark):
    """LSH-prefiltered near-dup emits a SUBSET of the exact pairs (same
    cosine values) and must catch the planted identical pair — identical
    vectors share every bucket, so no band can separate them."""
    from wetsa_cams_solrad_timeseries_spark.operators.similarity import (
        neardup_pairs_lsh,
    )

    df, vecs = _emb_df(spark)
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in neardup_pairs(df, 0.5).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in neardup_pairs_lsh(df, 0.5, dim=8).collect()
    }
    assert set(got) <= set(exact)
    assert all(exact[k] == v for k, v in got.items())
    assert (0, 1) in got  # planted identical pair always collides


def test_neardup_pairs_blocked_matches_exact(spark):
    """The block-pair BLAS kernel must reproduce the expression-tree
    all-pairs form exactly, with n_blocks < n_vecs so off-diagonal block
    pairs (where the A-side id can exceed the B-side id) are exercised."""
    from wetsa_cams_solrad_timeseries_spark.operators.similarity import (
        neardup_pairs_blocked,
    )

    df, vecs = _emb_df(spark)
    for threshold in (0.0, 0.5, 0.99):
        exp = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in neardup_pairs(df, threshold).collect()
        }
        got = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in neardup_pairs_blocked(df, threshold, n_blocks=3).collect()
        }
        assert got == exp, threshold


def test_hyperplane_buckets_deterministic_and_neardup_collides(spark):
    df, _ = _emb_df(spark)
    b1 = {(r["vec_id"], r["bucket"]) for r in hyperplane_buckets(df, dim=8).collect()}
    b2 = {(r["vec_id"], r["bucket"]) for r in hyperplane_buckets(df, dim=8).collect()}
    assert b1 == b2
    buckets0 = {b for v, b in b1 if v == 0}
    buckets1 = {b for v, b in b1 if v == 1}
    assert buckets0 == buckets1  # near-identical vectors share all sign bits
    # coefs are the portable hash formula
    c = hyperplane_coefs(2, 4)
    assert all(-1 <= x <= 1 for row in c for x in row)


def test_multimodal_payload_and_features(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "Zz9")], ["doc_id", "text"])
    shaped = attach_payload(df, "doc_id", "text")
    meta = {r["doc_id"]: r["meta"] for r in shaped.collect()}
    assert meta[1]["n_bytes"] == 3 and meta[1]["content_type"] == "text/plain"
    feats = {r["doc_id"]: r for r in extract_features(shaped).collect()}
    assert feats[1]["first_byte"] == ord("a")
    assert feats[1]["last_byte"] == ord("c")
    assert feats[1]["byte_sum"] == sum(b"abc")
    assert feats[2]["byte_sum"] == sum(b"Zz9")


def _bmp_bytes(w, h, pixel=(10, 20, 30)):
    """Minimal uncompressed 24-bpp BMP with a constant pixel."""
    import struct

    row = (w * 3 + 3) & ~3
    pix = (bytes(pixel) * w + b"\x00" * (row - w * 3)) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
    return header + info + pix


def _wav_bytes(rate=8000, samples=(0, 1000, -1000, 500)):
    import struct

    pcm = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_image_real_formats_and_codec_stub(spark):
    """BMP/PPM/PNG decode for real (dependency-free parsers); JPEG gets
    a per-row err marker — no task failure, no NotImplementedError."""
    import numpy as np

    from wetsa_cams_solrad_timeseries_spark.sinks.png import write_png

    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        png_path = os.path.join(td, "t.png")
        write_png(png_path, np.full((4, 6, 3), 100, dtype=np.uint8))
        png = open(png_path, "rb").read()
    ppm = b"P6\n6 4\n255\n" + bytes([7, 8, 9]) * 24
    rows = [
        (1, _bmp_bytes(6, 4)),
        (2, ppm),
        (3, png),
        (4, b"\xff\xd8\xff\xe0fakejpeg"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in decode_image(df).collect()}
    assert got[1]["format"] == "bmp" and (got[1]["width"], got[1]["height"]) == (6, 4)
    assert got[1]["mean_pixel"] == round((10 + 20 + 30) / 3 + 1e-9, 6)
    assert got[2]["format"] == "ppm" and got[2]["mean_pixel"] == round(8.0 + 1e-9, 6)
    assert got[3]["format"] == "png" and (got[3]["width"], got[3]["height"]) == (6, 4)
    assert got[3]["mean_pixel"] == round(100.0 + 1e-9, 6)
    assert got[4]["format"] == "jpeg" and "codec required" in got[4]["err"]
    assert got[4]["width"] is None


def test_decode_audio_wav(spark):
    from wetsa_cams_solrad_timeseries_spark.operators.multimodal import decode_audio

    df = spark.createDataFrame(
        [(1, _wav_bytes()), (2, b"not audio")], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r.asDict() for r in decode_audio(df).collect()}
    assert got[1]["format"] == "wav"
    assert got[1]["sample_rate"] == 8000 and got[1]["n_channels"] == 1
    assert got[1]["n_frames"] == 4
    import math

    exp_rms = math.sqrt((0 + 1000**2 + 1000**2 + 500**2) / 4)
    assert got[1]["rms"] == round(exp_rms + 1e-9, 6)
    assert got[2]["err"] is not None


def test_sample_frames_offsets(spark):
    df = spark.createDataFrame([(1, "x" * 3000)], ["doc_id", "text"])
    offs = [
        r["frame_offset"]
        for r in sample_frames(attach_payload(df, "doc_id", "text"), 1024).collect()
    ]
    assert offs == [1, 1025]


def test_streaming_twin_equals_batch(spark, sf_dir):
    from wetsa_cams_solrad_timeseries_spark.catalog import table
    from wetsa_cams_solrad_timeseries_spark.streaming.window_stream import (
        streaming_tumbling_agg,
    )

    got = streaming_tumbling_agg(spark, f"{sf_dir}/events.parquet", width="1 hour")
    ev = table(spark, sf_dir, "events")
    exp = (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.avg("value") + F.lit(1e-9), 6).alias("avg_value"))
        .select("event_type", F.col("w.start").alias("bucket_start"), "n_events", "avg_value")
    )
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def _dhash_reference(payload: bytes) -> list[int]:
    # Independent pure-Python spelling of the dHash band packing: 8x9
    # byte grid tiled modulo payload length, bit k = p[r][c] < p[r][c+1]
    # (k = r*8+c), bands pack 16 bits little-endian.
    n = len(payload)
    p = [(payload[j % n] if n else 0) for j in range(72)]
    bits = [
        1 if p[r * 9 + c] < p[r * 9 + c + 1] else 0
        for r in range(8)
        for c in range(8)
    ]
    return [
        sum(bits[b * 16 + i] << i for i in range(16)) for b in range(4)
    ]


def test_dhash_bands_matches_reference(spark):
    from wetsa_cams_solrad_timeseries_spark.operators.multimodal import (
        attach_payload,
        dhash_bands,
    )

    texts = ["hello world, this is payload zero", "abc", "", "aaaaaaaaaa"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: [r[f"band{b}"] for b in range(4)]
        for r in dhash_bands(attach_payload(df, "doc_id", "text")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _dhash_reference(t.encode()), t
    # constant payload -> no rising gradients -> all-zero hash; empty too
    assert got[2] == [0, 0, 0, 0] and got[3] == [0, 0, 0, 0]


def test_dhash_hamming_pairs_exact_dup_and_pigeonhole(spark):
    from wetsa_cams_solrad_timeseries_spark.operators.multimodal import (
        attach_payload,
        dhash_bands,
        dhash_hamming_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog 0123456789"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0 -> hamming 0
        (2, base[:-1] + "X"),  # near dup: few pixels differ
        (3, "completely different content with other words entirely!!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dhash_bands(attach_payload(df, "doc_id", "text"))
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_hamming_pairs(sigs, max_hamming=64).collect()
    }
    assert pairs.get((0, 1)) == 0
    # Pigeonhole: any candidate the band join emits shares >=1 band, and
    # every pair with hamming <= 3 MUST be emitted (4 bands, <=3 flipped
    # bits cannot touch all four). Verify against the full O(n^2) check.
    sig_map = {
        r["doc_id"]: [r[f"band{b}"] for b in range(4)] for r in sigs.collect()
    }
    for a in sig_map:
        for b in sig_map:
            if a >= b:
                continue
            ham = sum(
                bin(x ^ y).count("1")
                for x, y in zip(sig_map[a], sig_map[b])
            )
            if ham <= 3:
                assert (a, b) in pairs, (a, b, ham)
            if (a, b) in pairs:
                assert pairs[(a, b)] == ham
                assert any(
                    x == y for x, y in zip(sig_map[a], sig_map[b])
                )


def test_dhash_kernel_matches_reference_hypothesis(spark):
    # Property: the Arrow kernel's band packing equals the pure-Python
    # reference for arbitrary ASCII payloads (empty, whitespace, long).
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from wetsa_cams_solrad_timeseries_spark.operators.multimodal import (
        attach_payload,
        dhash_bands,
    )

    texts_strategy = st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=200,
        ),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=10, deadline=None)
    @given(texts=texts_strategy)
    def check(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: [r[f"band{b}"] for b in range(4)]
            for r in dhash_bands(attach_payload(df, "doc_id", "text")).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == _dhash_reference(t.encode()), repr(t)

    check()
