"""Block-size crossover probe for ngram_jaccard_pairs (optimization r14).

Question: once the O(tokens²) word_ngrams defect is fixed (functions/
text.py:_let), is the r14 inverted-index gram join still the right shape,
or should the operator have kept the all-pairs block join?

Fixture: DOCS content-derived documents (no replicas — gram collisions
come from a shared Zipf-ish template vocabulary, per-doc salt words keep
texts unique), split into blocks of size S.  Total corpus size is FIXED;
only the blocking granularity varies, which is exactly the 100 TB
question — at deployment, blocks are corpus/|block key| sized, and a
blocking key can never be assumed fine-grained.

Both arms run the same tokenizer (the fixed word_ngrams); the pair arm
is the pre-r14 shape (block self-join + array_intersect per pair), the
gram arm is the shipped inverted-index join.  Work: pair arm does
S²/2·|grams| interpreted intersections per block; gram arm does
Σ_g df(g)² codegen'd counted rows.  Expected: pair arm quadratic in S,
gram arm ~flat (df(g) grows with S only for template grams, bounded by
vocabulary reuse).

Usage: python tools/ngram_pairs_scale_probe.py [docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from steampipe_sqlite_spark.functions.text import word_ngrams
from steampipe_sqlite_spark.operators.dedup import ngram_jaccard_pairs
from steampipe_sqlite_spark.session import get_spark

DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
TOKENS_PER_DOC = 40
VOCAB = 800  # template vocabulary size; Zipf-ish reuse via modulo mixing


def corpus(spark, block_size: int):
    """Content-unique docs: token t of doc d is a template word chosen by
    a multiplicative mix (Zipf-ish frequency profile: low word ids are
    hit by many (d, t) residues) except every 8th token, which is a
    doc-unique salt — near-dup structure is irrelevant here, the probe
    times candidate generation, not recall."""
    # build the token list per doc as one concat_ws over TOKENS_PER_DOC
    # deterministic expressions (i is inlined per position)
    exprs = []
    for i in range(TOKENS_PER_DOC):
        if i % 8 == 7:
            exprs.append(f"concat('s', id, 'x', {i})")
        else:
            exprs.append(
                f"concat('w', pmod(id * 2654435761 + {i} * 40503, "
                f"1 + pmod(id * 48271 + {i} * 16807, {VOCAB})))"
            )
    text = "concat_ws(' ', " + ", ".join(exprs) + ")"
    return spark.range(DOCS).selectExpr(
        "cast(id AS STRING) AS doc_id",
        f"cast(floor(id / {block_size}) AS STRING) AS blk",
        f"{text} AS text",
    )


def pair_arm(df, threshold=0.3):
    """The pre-r14 shape: all in-block pairs, interpreted array_intersect."""
    grams = df.select(
        F.col("blk"), F.col("doc_id").alias("id"),
        word_ngrams(F.col("text"), 3).alias("grams"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    cond = [F.col("a.blk") == F.col("b.blk"), F.col("a.id") < F.col("b.id")]
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.col("a.grams")) + F.size(F.col("b.grams")) - inter
    jac = inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")
    return (
        a.join(b, cond)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def gram_arm(df, threshold=0.3):
    return ngram_jaccard_pairs(df, "text", "doc_id", ["blk"], n=3,
                               threshold=threshold)


def timed(spark, out) -> float:
    spark.catalog.clearCache()
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark("ngram_pairs_scale_probe")
    print(f"docs={DOCS} tokens/doc={TOKENS_PER_DOC} vocab={VOCAB}")
    for s in (100, 1000, 5000):
        df = corpus(spark, s)
        rows = {}
        for name, arm in (("pair", pair_arm), ("gram", gram_arm)):
            best = min(timed(spark, arm(df)) for _ in range(2))
            rows[name] = best
        n_match = gram_arm(df).count()
        print(
            f"block={s:>5}: pair {rows['pair']:7.2f}s   "
            f"gram {rows['gram']:7.2f}s   matches={n_match}"
        )


if __name__ == "__main__":
    main()
