"""Multimodal corpus: binary media columns through the Arrow/mapInPandas
decode path (operators/multimodal.py).

The Spark side synthesizes the fake container format JVM-side, round-trips
it through binary, and parses the bytes in Python; the DuckDB oracle
recomputes every decoded field arithmetically from ``doc_id`` — a hash
match proves the encode → Arrow → struct.unpack plumbing end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from steampipe_sqlite_spark.operators.multimodal import (
    decode_audio_meta,
    decode_image_meta,
    decode_video_meta,
    resize_plan,
    sample_frames,
    synthesize_media,
)
from steampipe_sqlite_spark.plans.registry import query
from steampipe_sqlite_spark.tables import load_table


def _media(spark, sf_dir):
    return synthesize_media(load_table(spark, sf_dir, "documents"))


@query(
    "mm_image_decode",
    oracle="""
SELECT doc_id,
       CAST(64 + (doc_id * 37) % 193 AS INT) AS width,
       CAST(48 + (doc_id * 53) % 145 AS INT) AS height,
       CAST(1 + (doc_id % 2) * 2 AS INT) AS channels,
       (64 + (doc_id * 37) % 193) * (48 + (doc_id * 53) % 145)
           * (1 + (doc_id % 2) * 2) AS n_pixels,
       CAST((doc_id * 7) % 256 AS INT) AS first_px,
       (SELECT AVG((doc_id * 7 + j * 13) % 256)
        FROM generate_series(0, 7) t(j)) AS px_mean,
       CAST((SELECT MAX((doc_id * 7 + j * 13) % 256)
             FROM generate_series(0, 7) t(j)) AS INT) AS px_max
FROM documents
WHERE doc_id % 3 = 0
ORDER BY doc_id
""",
)
def mm_image_decode(spark, sf_dir):
    """Binary FIMG payloads decoded via mapInPandas: header fields plus
    numpy feature extraction over the sample plane (mean/max pixel).
    Map-only: no shuffle, Arrow batches both directions."""
    return decode_image_meta(_media(spark, sf_dir)).orderBy("doc_id")


@query(
    "mm_image_resize",
    oracle="""
WITH img AS (
  SELECT doc_id,
         CAST(64 + (doc_id * 37) % 193 AS INT) AS width,
         CAST(48 + (doc_id * 53) % 145 AS INT) AS height
  FROM documents WHERE doc_id % 3 = 0)
SELECT doc_id, width, height,
       GREATEST(1, CAST(FLOOR(width * 64 / GREATEST(width, height)) AS BIGINT)) AS out_w,
       GREATEST(1, CAST(FLOOR(height * 64 / GREATEST(width, height)) AS BIGINT)) AS out_h
FROM img
ORDER BY doc_id
""",
)
def mm_image_resize(spark, sf_dir):
    """Aspect-preserving resize planning (fit 64-box) on decoded dims."""
    return resize_plan(decode_image_meta(_media(spark, sf_dir)), box=64).orderBy("doc_id")


@query(
    "mm_video_frame_sample",
    oracle="""
WITH vid AS (
  SELECT doc_id, 30 + (doc_id * 17) % 271 AS n_frames
  FROM documents WHERE doc_id % 3 = 1)
SELECT doc_id, UNNEST(generate_series(0, n_frames - 1, 10)) AS frame_idx
FROM vid
ORDER BY doc_id, frame_idx
""",
)
def mm_video_frame_sample(spark, sf_dir):
    """Every-10th-frame sampling: FVID header decode → sequence + explode.
    Output bounded at n_frames/10 rows per video — batch-memory safe."""
    vids = decode_video_meta(_media(spark, sf_dir))
    return sample_frames(vids, every=10).orderBy("doc_id", "frame_idx")


@query(
    "mm_audio_stats",
    oracle="""
WITH aud AS (
  SELECT doc_id,
         CAST(8000 * (1 + doc_id % 3) AS INT) AS sample_rate,
         8000 * (1 + doc_id % 3) * (1 + doc_id % 10) + doc_id % 97 AS n_samples,
         CAST(1 + (doc_id % 2) * 2 AS INT) AS channels
  FROM documents WHERE doc_id % 3 = 2)
SELECT doc_id, sample_rate, n_samples, channels,
       CAST(n_samples AS DOUBLE) / sample_rate AS duration_sec
FROM aud
ORDER BY doc_id
""",
)
def mm_audio_stats(spark, sf_dir):
    """FAUD header decode → per-clip duration (exact IEEE division of
    identical integer operands on both engines — no rounding needed)."""
    return (
        decode_audio_meta(_media(spark, sf_dir))
        .withColumn("duration_sec", F.col("n_samples").cast("double") / F.col("sample_rate"))
        .orderBy("doc_id")
    )


@query(
    "mm_media_inventory",
    oracle="""
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'video' ELSE 'audio' END AS kind,
       lang,
       COUNT(*) AS n,
       CAST(SUM(CASE doc_id % 3
             WHEN 0 THEN 21
             WHEN 1 THEN 17
             ELSE 13 END) AS BIGINT) AS total_bytes
FROM documents
GROUP BY 1, 2
ORDER BY kind, lang
""",
)
def mm_media_inventory(spark, sf_dir):
    """Catalog rollup over the typed-metadata struct (kind × lang counts and
    payload byte totals) — metadata stays queryable without touching the
    binary payload, which is the point of the typed-meta design."""
    m = _media(spark, sf_dir)
    return (
        m.groupBy("kind", F.col("meta.lang").alias("lang"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        )
        .orderBy("kind", "lang")
    )


@query("mm_image_phash_neardup", oracle=None)
def mm_image_phash_neardup(spark, sf_dir):
    """Image near-duplicate pairs via 64-bit DCT pHash + 4×16-bit banded
    LSH (hamming ≤ 6).  Non-SQL-expressible (DCT + median threshold) —
    rows-only driver check; determinism, band recall, and perturbation
    behavior are pinned in tests/test_multimodal.py."""
    from steampipe_sqlite_spark.operators.multimodal import image_phash_pairs

    return image_phash_pairs(_media(spark, sf_dir), max_hamming=6).orderBy(
        "id_a", "id_b"
    )
