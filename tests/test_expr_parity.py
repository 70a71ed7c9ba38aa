"""Parity tests for the generated-SQL ("expr-string") operator internals.

simhash_fingerprints, minhash_signatures_oph and lsh_signature build wide
expressions as SQL strings (see BASELINE.md, query-construction latency).
These tests recompute each result in plain Python/numpy FROM THE SAME
Spark-hashed inputs — so the packed-counter folds, densification and
sign-bit packing are verified independently of the SQL generators, while
the hash family itself (xxhash64) stays Spark-side in both paths.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from steampipe_sqlite_spark.operators.dedup import (
    _spread,
    minhash_signatures_oph,
    simhash_fingerprints,
)
from steampipe_sqlite_spark.operators.similarity import hyperplanes, lsh_signature
from steampipe_sqlite_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").limit(60).cache()


def test_simhash_fingerprints_match_python_majority_vote(spark, docs):
    from steampipe_sqlite_spark.functions.text import tokens

    hashed = (
        _spread(docs)
        .select(F.col("doc_id").alias("id"), F.explode(tokens(F.col("text"))).alias("t"))
        .select("id", F.xxhash64("t").alias("h"))
        .collect()
    )
    votes: dict[int, list[int]] = {}
    counts: dict[int, int] = {}
    for r in hashed:
        acc = votes.setdefault(r.id, [0] * 64)
        counts[r.id] = counts.get(r.id, 0) + 1
        h = r.h & 0xFFFFFFFFFFFFFFFF  # two's complement view
        for b in range(64):
            acc[b] += (h >> b) & 1
    expected = {}
    for i, acc in votes.items():
        fp = 0
        for b in range(64):
            if 2 * acc[b] > counts[i]:  # strict ones-majority
                fp |= 1 << b
        # back to signed long as Spark materializes it
        expected[i] = fp - (1 << 64) if fp >= 1 << 63 else fp

    got = {r.id: r.fp for r in simhash_fingerprints(docs, "text", "doc_id").collect()}
    assert got == expected


def test_oph_minhash_signatures_match_python_densify(spark, docs):
    from steampipe_sqlite_spark.functions.text import normalize_text

    num_hashes, shingle_k = 64, 5
    shift = 64 - num_hashes.bit_length() + 1
    normed = _spread(docs).select(
        F.col("doc_id").alias("id"), normalize_text(F.col("text")).alias("norm")
    )
    hashed = (
        normed.select(
            "id",
            "norm",
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.length("norm") - F.lit(shingle_k - 1), F.lit(1)))
            ).alias("i"),
        )
        .select("id", F.expr(f"substr(norm, i, {shingle_k})").alias("s"))
        .select("id", F.xxhash64("s").alias("h"))
        .collect()
    )
    buckets: dict[int, dict[int, int]] = {}
    for r in hashed:
        b = (r.h & 0xFFFFFFFFFFFFFFFF) >> shift
        per = buckets.setdefault(r.id, {})
        per[b] = min(per.get(b, r.h), r.h)  # min over SIGNED longs, as Spark's min()
    expected = {
        i: [per.get(b, min(per.values())) for b in range(num_hashes)]
        for i, per in buckets.items()
    }

    got = {
        r.id: list(r.sig)
        for r in minhash_signatures_oph(docs, "text", "doc_id", num_hashes, shingle_k).collect()
    }
    assert got == expected


def test_lsh_signature_matches_numpy_sign_bits(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    planes = hyperplanes(dim=16, n_planes=8, seed=123)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)], "id long, v array<float>"
    )
    got = {r.id: r.sig for r in df.select("id", lsh_signature("v", planes).alias("sig")).collect()}

    p = np.array(planes)  # (8, 16)
    dots = vecs.astype(np.float64) @ p.T  # same float32→double widening as the SQL
    expected = {
        i: int(sum((1 << j) for j in range(8) if dots[i, j] > 0)) for i in range(len(vecs))
    }
    assert got == expected
