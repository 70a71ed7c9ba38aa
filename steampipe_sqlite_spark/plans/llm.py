"""LLM-pipeline corpus: text analysis, dedup, similarity search.

The training-data-pipeline layer over ``documents`` / ``embeddings``
(FIXTURES.md §3).  Spark implementations live in functions/text.py,
functions/vectors.py, operators/dedup.py, operators/similarity.py; every
SQL-expressible op carries a DuckDB oracle that mirrors the computation
step-for-step (same normalization, same association order, same rounding).
Minhash/simhash/LSH use engine hash functions DuckDB doesn't have →
rows-only checks, with recall tests in tests/test_llm_ops.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from steampipe_sqlite_spark.operators.scale import persist_tracked
from steampipe_sqlite_spark.plans.registry import presentation_sort, query, sql_query
from steampipe_sqlite_spark.plans.relational import _ppm_div
from steampipe_sqlite_spark.tables import load_table, register_views

# DuckDB twins of functions/text.py normalization (RE2 spelling; 'g' flag).
_DD_NORM = (
    r"trim(regexp_replace(regexp_replace(lower(text),"
    r"'[^a-z0-9\x{4e00}-\x{9fff} ]',' ','g'),'\s+',' ','g'))"
)
_DD_TOKS = f"string_split({_DD_NORM}, ' ')"


# --- Text analysis --------------------------------------------------------


@query(
    "text_token_count",
    oracle=f"""
SELECT doc_id,
       len({_DD_TOKS}) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_ish,
       n_chars
FROM documents
ORDER BY doc_id
""",
)
def text_token_count(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex tokens
    (functions/text.py) — pure JVM regexp expressions."""
    from steampipe_sqlite_spark.functions.text import bpe_ish_token_count, token_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_ish"),
        "n_chars",
    ).orderBy("doc_id")


@query(
    "text_quality_score",
    oracle=f"""
SELECT doc_id,
       ROUND((
         (CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0 ELSE 0.5 END)
         + (CASE WHEN length(text)*1.0/greatest(len({_DD_TOKS}),1) BETWEEN 3.0 AND 12.0
                 THEN 1.0 ELSE 0.5 END)
         + len(regexp_extract_all(text,'[A-Za-z]'))*1.0/greatest(length(text),1)
       ) / 3.0, 4) AS quality
FROM documents
ORDER BY doc_id
""",
)
def text_quality_score(spark, sf_dir):
    """Heuristic quality scoring (length band + mean word length +
    alphabetic ratio)."""
    from steampipe_sqlite_spark.functions.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", quality_score(F.col("text")).alias("quality")
    ).orderBy("doc_id")


@query(
    "text_decontaminate",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_distinct([array_to_string(list_slice(toks, i, i+7), ' ')
           FOR i IN range(1, greatest(len(toks)-7, 1)+1)]) AS grams
  FROM (SELECT doc_id, {{toks}} AS toks FROM documents)
),
bench AS (SELECT DISTINCT UNNEST(grams) AS g FROM t WHERE doc_id < 20),
corpus AS (SELECT doc_id, UNNEST(grams) AS g FROM t WHERE doc_id >= 20),
hits AS (
  SELECT c.doc_id, COUNT(*) AS n_overlap
  FROM corpus c JOIN bench b ON c.g = b.g
  GROUP BY c.doc_id
)
SELECT t.doc_id,
       COALESCE(h.n_overlap, 0) AS n_overlap,
       (COALESCE(h.n_overlap, 0) > 0) AS contaminated
FROM t LEFT JOIN hits h ON t.doc_id = h.doc_id
WHERE t.doc_id >= 20
ORDER BY t.doc_id
""".format(toks=_DD_TOKS),
)
def text_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 appendix-C style, 8-gram scale-down
    for the short synthetic docs): count each corpus document's distinct
    word-8-grams that also occur in the benchmark set (doc_id < 20 stands
    in for an eval suite).  The benchmark gram set is tiny → broadcast; the
    corpus side is map + broadcast-semi-join + one aggregation shuffle —
    no all-pairs anything, the shape a 100 TB decontamination pass needs."""
    from steampipe_sqlite_spark.functions.text import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select("doc_id", word_ngrams(F.col("text"), 8).alias("grams"))
    bench = (
        grams.filter(F.col("doc_id") < 20)
        .select(F.explode("grams").alias("g"))
        .distinct()
    )
    corpus = grams.filter(F.col("doc_id") >= 20)
    hits = (
        corpus.select("doc_id", F.explode("grams").alias("g"))
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_repetition_flags",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text,
         [array_to_string(list_slice(toks, i, i+1), ' ')
           FOR i IN range(1, greatest(len(toks)-1, 1)+1)] AS grams,
         string_split(text, '. ') AS sents
  FROM (SELECT doc_id, text, {{toks}} AS toks FROM documents)
),
g AS (SELECT doc_id, UNNEST(grams) AS g FROM t),
c AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g GROUP BY doc_id, g),
top AS (SELECT doc_id, MAX(cnt) AS mx, SUM(cnt) AS tot FROM c GROUP BY doc_id)
SELECT t.doc_id,
       ROUND(top.mx * 1.0 / top.tot, 4) AS top_2gram_frac,
       ROUND(1.0 - len(list_distinct(t.sents)) * 1.0 / greatest(len(t.sents), 1), 4)
         AS dup_sent_frac,
       (top.mx * 1.0 / top.tot <= 0.2) AS rep2_ok,
       (1.0 - len(list_distinct(t.sents)) * 1.0 / greatest(len(t.sents), 1) <= 0.3)
         AS dupsent_ok
FROM t JOIN top ON t.doc_id = top.doc_id
ORDER BY t.doc_id
""".format(toks=_DD_TOKS),
)
def text_repetition_flags(spark, sf_dir):
    """The repetition half of the Gopher rule set (Rae et al. 2021):
    most-frequent-2-gram fraction and duplicate-sentence fraction, with
    per-rule pass flags.  Shape: one explode + two keyed aggregations on
    (doc, gram) then (doc) — linear, the gram shuffle carries one scalar
    count per distinct gram."""
    from steampipe_sqlite_spark.functions.text import normalize_text

    from steampipe_sqlite_spark.functions.text import _let

    docs = load_table(spark, sf_dir, "documents")
    # bind the token split once per row (optimization r14): a split chain
    # referenced inside the transform lambda is re-evaluated per element
    # — O(tokens²) per document (see functions/text.py:_let)
    grams = _let(
        F.split(normalize_text(F.col("text")), " "),
        lambda toks: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    )
    sents = F.split(F.col("text"), r"\. ")
    base = docs.select("doc_id", grams.alias("grams"), sents.alias("sents"))
    top = (
        base.select("doc_id", F.explode("grams").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("mx"), F.sum("cnt").alias("tot"))
    )
    dup_frac = F.round(
        1.0
        - F.size(F.array_distinct("sents")).cast("double")
        / F.greatest(F.size("sents"), F.lit(1)).cast("double"),
        4,
    )
    frac = F.col("mx").cast("double") / F.col("tot").cast("double")
    raw_dup = (
        1.0
        - F.size(F.array_distinct("sents")).cast("double")
        / F.greatest(F.size("sents"), F.lit(1)).cast("double")
    )
    return (
        base.select("doc_id", "sents", dup_frac.alias("dup_sent_frac"))
        .join(top, "doc_id")
        .select(
            "doc_id",
            F.round(frac, 4).alias("top_2gram_frac"),
            "dup_sent_frac",
            (frac <= 0.2).alias("rep2_ok"),
            (raw_dup <= 0.3).alias("dupsent_ok"),
        )
        .orderBy("doc_id")
    )


_DECONTAMINATE_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_distinct([array_to_string(list_slice(toks, i, i+7), ' ')
           FOR i IN range(1, greatest(len(toks)-7, 1)+1)]) AS grams
  FROM (SELECT doc_id, {_DD_TOKS} AS toks FROM documents)
),
bench AS (SELECT DISTINCT UNNEST(grams) AS g FROM t WHERE doc_id < 20),
corpus AS (SELECT doc_id, UNNEST(grams) AS g FROM t WHERE doc_id >= 20),
hits AS (
  SELECT c.doc_id, COUNT(*) AS n_overlap
  FROM corpus c JOIN bench b ON c.g = b.g
  GROUP BY c.doc_id
)
SELECT t.doc_id,
       COALESCE(h.n_overlap, 0) AS n_overlap,
       (COALESCE(h.n_overlap, 0) > 0) AS contaminated
FROM t LEFT JOIN hits h ON t.doc_id = h.doc_id
WHERE t.doc_id >= 20
ORDER BY t.doc_id
"""


@query("text_decontaminate_bloom", oracle=_DECONTAMINATE_ORACLE)
def text_decontaminate_bloom(spark, sf_dir):
    """Decontamination with a Bloom pre-filter: the benchmark 8-gram set
    is compressed into an m-bit bitmap (functions/sketches.bloom_bitmap)
    that rides to executors as a 1 KB literal; corpus grams are screened
    MAP-SIDE and only maybe-members reach the exact join.  Same answer as
    text_decontaminate (Bloom has no false negatives; false positives die
    in the exact join — hence the identical oracle), but the probe set no
    longer needs to broadcast as strings: at a real benchmark-suite scale
    (10⁸ grams) the bitmap is megabytes where the string set is tens of
    GB.  The at-scale shape of GPT-3-appendix-C decontamination."""
    from steampipe_sqlite_spark.functions.sketches import (
        bloom_bitmap,
        bloom_might_contain,
    )
    from steampipe_sqlite_spark.functions.text import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select("doc_id", word_ngrams(F.col("text"), 8).alias("grams"))
    bench = (
        grams.filter(F.col("doc_id") < 20)
        .select(F.explode("grams").alias("g"))
        .distinct()
    )
    bitmap = bloom_bitmap(bench, "g", m_bits=8192, k=3)
    corpus = grams.filter(F.col("doc_id") >= 20)
    candidates = (
        corpus.select("doc_id", F.explode("grams").alias("g"))
        .filter(bloom_might_contain(bitmap, "g", m_bits=8192, k=3))
    )
    hits = (
        candidates.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_boilerplate_strip",
    oracle="""
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || '. Subscribe to our newsletter for updates. All rights reserved'
              ELSE text END AS text2
  FROM documents
),
sp AS (SELECT doc_id, string_split(text2, '. ') AS sents FROM seeded),
tot AS (SELECT COUNT(*) AS n_docs FROM seeded),
s AS (
  SELECT doc_id, i AS pos, sents[i] AS sent
  FROM sp, UNNEST(generate_series(1, len(sents))) AS t(i)
),
freq AS (SELECT sent, COUNT(DISTINCT doc_id) AS nd FROM s GROUP BY sent),
boil AS (SELECT sent FROM freq, tot WHERE nd >= 0.05 * n_docs),
kept AS (SELECT * FROM s WHERE sent NOT IN (SELECT sent FROM boil)),
agg AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         md5(string_agg(sent, '. ' ORDER BY pos)) AS clean_md5
  FROM kept GROUP BY doc_id
)
SELECT sp.doc_id,
       len(sp.sents) AS n_sents,
       len(sp.sents) - COALESCE(a.n_kept, 0) AS n_removed,
       COALESCE(a.clean_md5, md5('')) AS clean_md5
FROM sp LEFT JOIN agg a ON sp.doc_id = a.doc_id
ORDER BY sp.doc_id
""",
)
def text_boilerplate_strip(spark, sf_dir):
    """C4-style boilerplate removal: sentences occurring in ≥5% of
    documents (a deterministic footer is planted on every 3rd doc, since
    the synthetic corpus has no natural repeats) are stripped from every
    document, order-preserving.  Corpus-frequency pass = one sentence
    shuffle; the boilerplate set is tiny → broadcast anti-join; the md5 of
    the reassembled text proves byte-identical cleanup cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 3 = 0 THEN concat(text,"
            " '. Subscribe to our newsletter for updates. All rights reserved')"
            " ELSE text END"
        ).alias("text2"),
    )
    sp = seeded.select("doc_id", F.split("text2", r"\. ").alias("sents"))
    total = sp.select(F.count(F.lit(1)).alias("n_docs"))
    s = sp.select("doc_id", F.posexplode("sents").alias("pos", "sent"))
    freq = s.groupBy("sent").agg(F.countDistinct("doc_id").alias("nd"))
    boil = (
        freq.crossJoin(F.broadcast(total))
        .filter(F.col("nd") >= 0.05 * F.col("n_docs"))
        .select("sent")
    )
    kept = s.join(F.broadcast(boil), "sent", "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sent"))),
                    lambda x: x["sent"],
                ),
                ". ",
            )
        ).alias("clean_md5"),
    )
    return (
        sp.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.size("sents").cast("long").alias("n_sents"),
            (F.size("sents").cast("long") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


# Deterministic PII injection (the synthetic corpus has none): every 7th
# doc gains an email + phone derived from doc_id, so the redaction rules
# have real positives to scrub — same construction on both engines.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"


@query(
    "text_pii_redact",
    oracle=f"""
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || doc_id ||
                   '@example.com or +1 (555) 010-' ||
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                          '{_PII_PHONE}', '[PHONE]', 'g')) AS redacted_md5
FROM seeded
ORDER BY doc_id
""",
)
def text_pii_redact(spark, sf_dir):
    """PII scrubbing: email/phone detection counts plus the md5 of the
    fully redacted text (compact value proof that both engines rewrote
    the same spans).  Pure JVM regexp_count/regexp_replace — shuffle-free
    map work, which is exactly what a 100 TB scrub pass must be."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 7 = 0 THEN concat(text, ' contact user', doc_id,"
            " '@example.com or +1 (555) 010-',"
            " lpad(cast(doc_id % 10000 as string), 4, '0')) ELSE text END"
        ).alias("text"),
    )
    return seeded.select(
        "doc_id",
        F.regexp_count("text", F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_count("text", F.lit(_PII_PHONE)).alias("n_phones"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace("text", _PII_EMAIL, "[EMAIL]"),
                _PII_PHONE,
                "[PHONE]",
            )
        ).alias("redacted_md5"),
    ).orderBy("doc_id")


@query(
    "text_gopher_flags",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, {_DD_TOKS} AS toks FROM documents
)
SELECT doc_id,
       len(toks) AS word_count,
       (len(toks) BETWEEN 50 AND 100000) AS wc_ok,
       (length(text) * 1.0 / greatest(len(toks), 1) BETWEEN 3.0 AND 13.0) AS mwl_ok,
       (len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) * 1.0
          / greatest(len(toks), 1) >= 0.8) AS alpha_ok,
       (len(regexp_extract_all(text, '#|\\.\\.\\.')) * 1.0
          / greatest(len(toks), 1) <= 0.1) AS symbol_ok,
       ((len(toks) BETWEEN 50 AND 100000)
        AND (length(text) * 1.0 / greatest(len(toks), 1) BETWEEN 3.0 AND 13.0)
        AND (len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) * 1.0
               / greatest(len(toks), 1) >= 0.8)
        AND (len(regexp_extract_all(text, '#|\\.\\.\\.')) * 1.0
               / greatest(len(toks), 1) <= 0.1)) AS pass_all
FROM t
ORDER BY doc_id
""",
)
def text_gopher_flags(spark, sf_dir):
    """Gopher-style document quality rules (Rae et al. 2021, public):
    word-count band, mean-word-length band, alphabetic-word ratio,
    symbol-to-word ratio — per-rule flags plus the conjunction, so a
    pipeline can both filter and audit WHY a document fell out.  Pure
    JVM regex/array expressions, no shuffle.

    Construction (optimization r15): the tokens chain and its size are
    materialized as COLUMNS in two intermediate projections before the
    flag expressions reference them — the single-projection spelling
    duplicated split(normalize(text)) into every flag (and pass_all
    re-spells all four flags), and the lambda-bearing alpha filter blocks
    Catalyst's subexpression elimination for the whole subtree.
    CollapseProject leaves the stacked projections alone because the
    bound aliases are expensive and multiply-referenced.  Measured
    1.04 → 0.79 s med interleaved (5/5 pairs) at sf0.1; bit-identical
    output asserted."""
    from steampipe_sqlite_spark.functions.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "text",
        F.split(normalize_text(F.col("text")), " ").alias("toks"),
    )
    t2 = t.select("doc_id", "text", "toks", F.size("toks").alias("wc"))
    wc = F.col("wc")
    mwl = F.length("text").cast("double") / F.greatest(wc, F.lit(1))
    alpha_ratio = (
        F.size(F.filter(F.col("toks"), lambda w: w.rlike("[a-z]"))).cast("double")
        / F.greatest(wc, F.lit(1)).cast("double")
    )
    symbol_ratio = (
        F.regexp_count("text", F.lit(r"#|\.\.\.")).cast("double")
        / F.greatest(wc, F.lit(1)).cast("double")
    )
    wc_ok = (wc >= 50) & (wc <= 100000)
    mwl_ok = (mwl >= 3.0) & (mwl <= 13.0)
    alpha_ok = alpha_ratio >= 0.8
    symbol_ok = symbol_ratio <= 0.1
    return t2.select(
        "doc_id",
        wc.cast("long").alias("word_count"),
        wc_ok.alias("wc_ok"),
        mwl_ok.alias("mwl_ok"),
        alpha_ok.alias("alpha_ok"),
        symbol_ok.alias("symbol_ok"),
        (wc_ok & mwl_ok & alpha_ok & symbol_ok).alias("pass_all"),
    ).orderBy("doc_id")


def _dd_stop_hits(lang_words: list[str]) -> str:
    arr = "[" + ",".join(f"'{w}'" for w in lang_words) + "]"
    return f"len(list_filter({_DD_TOKS}, t -> list_contains({arr}, t)))"


@query(
    "text_lang_id",
    oracle=None,  # filled below to keep construction readable
)
def text_lang_id(spark, sf_dir):
    """Stopword/n-gram language ID vs the labeled lang column."""
    from steampipe_sqlite_spark.functions.text import lang_id

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "lang", lang_id(F.col("text")).alias("predicted"))
        .withColumn("hit", (F.col("lang") == F.col("predicted")).cast("int"))
        .orderBy("doc_id")
    )


def _lang_oracle() -> str:
    from steampipe_sqlite_spark.functions.text import STOPWORDS

    en, de, fr, es = (_dd_stop_hits(STOPWORDS[lang]) for lang in ("en", "de", "fr", "es"))
    return f"""
WITH scored AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS cjk,
         {en} AS s_en, {de} AS s_de, {fr} AS s_fr, {es} AS s_es
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN cjk > 0 THEN 'zh'
            WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unknown'
            WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
            ELSE 'es' END AS predicted,
       CAST(lang = (CASE WHEN cjk > 0 THEN 'zh'
            WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unknown'
            WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
            ELSE 'es' END) AS INT) AS hit
FROM scored
ORDER BY doc_id
"""


from steampipe_sqlite_spark.plans.registry import ORACLES  # noqa: E402

ORACLES["text_lang_id"] = _lang_oracle()


@query(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id, md5({_DD_NORM}) AS fp
FROM documents
ORDER BY doc_id
""",
)
def text_fingerprint(spark, sf_dir):
    """Deterministic md5 fingerprint of normalized text."""
    from steampipe_sqlite_spark.functions.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).orderBy("doc_id")


# --- Deduplication --------------------------------------------------------


@query(
    "dedup_exact",
    oracle=f"""
WITH doubled AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
)
SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
         '[^a-z0-9\\x{{4e00}}-\\x{{9fff}} ]',' ','g'),'\\s+',' ','g'))) AS fp,
       MIN(doc_id) AS keep_id, COUNT(*) AS group_size
FROM doubled
GROUP BY 1
ORDER BY keep_id
""",
)
def dedup_exact_q(spark, sf_dir):
    """Exact dedup (hash-groupBy) over a corpus with planted duplicates
    (documents ∪ re-keyed documents) — every group collapses to size 2."""
    from steampipe_sqlite_spark.operators.dedup import dedup_exact

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + F.lit(1000000)).alias("doc_id"), "text")
    )
    return dedup_exact(doubled, "text", "doc_id").orderBy("keep_id")


# The oracle replays functions/urls.py's canonicalization step chain as
# a CTE ladder.  Regexes are shared verbatim between Java regex and RE2;
# the ONE cross-engine divergence is regexp_replace's default scope —
# Spark replaces all occurrences, DuckDB only the first without the 'g'
# flag — so the slash-collapse spells the flag explicitly.
_URL_CANON_ORACLE = """
WITH raw AS (
  SELECT doc_id,
         concat(
           CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END,
           CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,
           'crawl.example.com',
           CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END,
           '/Articles//', CAST(doc_id % 113 AS VARCHAR),
           CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
           '?id=', CAST(doc_id % 113 AS VARCHAR),
           CASE WHEN doc_id % 2 = 0 THEN '&utm_source=feed&utm_medium=rss' ELSE '' END,
           CASE WHEN doc_id % 7 = 0 THEN '&ref=homepage' ELSE '' END,
           '&z=26&a=1',
           CASE WHEN doc_id % 11 = 0 THEN '#section-2' ELSE '' END) AS url
  FROM documents
), s1 AS (
  SELECT doc_id, url, regexp_replace(trim(url), '#.*$', '') AS u FROM raw
), s2 AS (
  SELECT *, lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme FROM s1
), s3 AS (
  SELECT *, substr(u, length(scheme) + 4) AS rest FROM s2
), s4 AS (
  SELECT *, lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport FROM s3
), s5 AS (
  SELECT *,
         CASE WHEN scheme = 'https'
              THEN regexp_replace(regexp_replace(hostport, '^www\\.', ''), ':443$', '')
              WHEN scheme = 'http'
              THEN regexp_replace(regexp_replace(hostport, '^www\\.', ''), ':80$', '')
              ELSE regexp_replace(hostport, '^www\\.', '') END AS host,
         substr(rest, length(hostport) + 1) AS tail
  FROM s4
), s6 AS (
  SELECT *, regexp_extract(tail, '^([^?]*)', 1) AS path0 FROM s5
), s7 AS (
  SELECT *,
         CASE WHEN length(tail) > length(path0)
              THEN substr(tail, length(path0) + 2) ELSE '' END AS query
  FROM s6
), s8 AS (
  SELECT *,
         CASE WHEN regexp_replace(regexp_replace(path0, '/{2,}', '/', 'g'), '/$', '') = ''
              THEN '/'
              ELSE regexp_replace(regexp_replace(path0, '/{2,}', '/', 'g'), '/$', '') END AS path,
         array_to_string(list_sort(list_filter(str_split(query, '&'),
             p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|gclid|fbclid|ref)(=|$)'))), '&') AS qs
  FROM s7
)
SELECT scheme || '://' || host || path
         || CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canon_url,
       COUNT(*) AS group_size,
       COUNT(DISTINCT url) AS n_raw_forms,
       MIN(doc_id) AS keep_id
FROM s8
GROUP BY 1
ORDER BY keep_id
"""


# Unicode NFC dedup witness.  Raw strings are synthesized identically in
# both engines: the canonical key is doc_id % 53; doc_id % 3 picks the
# variant — composed 'café' (U+00E9), decomposed 'cafe'+U+0301 (must
# NFC-collapse with the composed form), or pure-ASCII 'cafe' (a DISTINCT
# canonical — ASCII is untouched by NFC).  n_raw_forms = 2 on the
# non-ASCII groups proves the normalizer, not the generator, collapses.
_NFC_ORACLE = """
WITH raw AS (
  SELECT doc_id,
         concat('doc-', CAST(doc_id % 53 AS VARCHAR), '-',
                CASE WHEN doc_id % 3 = 0 THEN 'caf' || chr(233)
                     WHEN doc_id % 3 = 1 THEN 'cafe' || chr(769)
                     ELSE 'cafe' END) AS s
  FROM documents
)
SELECT nfc_normalize(s) AS nfc_form,
       COUNT(*) AS group_size,
       COUNT(DISTINCT s) AS n_raw_forms,
       MIN(doc_id) AS keep_id
FROM raw
GROUP BY 1
ORDER BY keep_id
"""


@query("text_nfc_dedup", oracle=_NFC_ORACLE)
def text_nfc_dedup_q(spark, sf_dir):
    """Unicode NFC normalization as a dedup key (crawl pipelines
    normalize before hashing; composed vs decomposed accents otherwise
    under-collapse every downstream dedup).  Spark has no built-in
    normalizer, so the Python path is Arrow-batched
    (functions/text.nfc_normalize_udf) and GATED: ASCII strings are NFC
    by definition, so the plan routes only rows failing
    ``rlike '^[\\x00-\\x7F]*$'`` through the pandas UDF and passes the
    ASCII bulk through JVM-side untouched — on a real crawl corpus the
    Python stage sees the small non-ASCII fraction, not 100 TB.  Oracle:
    DuckDB's native nfc_normalize over the identical synthesis."""
    from steampipe_sqlite_spark.functions.text import nfc_normalize_udf

    d = F.col("doc_id")
    raw = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("doc-"),
            (d % 53).cast("string"),
            F.lit("-"),
            # composed U+00E9 vs decomposed e+U+0301, spelled as escapes so an
            # editor or linter cannot silently re-compose the source bytes
            F.when(d % 3 == 0, F.lit("caf\u00e9"))
            .when(d % 3 == 1, F.lit("cafe\u0301"))
            .otherwise(F.lit("cafe")),
        ).alias("s"),
    )
    is_ascii = F.col("s").rlike("^[\\x00-\\x7F]*$")
    ascii_rows = raw.filter(is_ascii).select("doc_id", "s", F.col("s").alias("nfc_form"))
    nfc = nfc_normalize_udf()
    other_rows = raw.filter(~is_ascii).select("doc_id", "s", nfc(F.col("s")).alias("nfc_form"))
    return (
        ascii_rows.unionByName(other_rows)
        .groupBy("nfc_form")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("s").alias("n_raw_forms"),
            F.min("doc_id").alias("keep_id"),
        )
        .orderBy("keep_id")
    )


@query("dedup_url_canonical", oracle=_URL_CANON_ORACLE)
def dedup_url_canonical_q(spark, sf_dir):
    """URL-keyed first-stage dedup (the cheapest collapse in a crawl
    pipeline, run before any content dedup): canonicalize per
    functions/urls.canonical_url — scheme/host case, www, default
    ports, duplicate/trailing slashes, fragments, tracking params,
    param order — then one hash-groupBy on the canonical key.

    The fixture has no URL column, so raw URLs are synthesized
    IDENTICALLY in both engines from doc_id residues: the canonical key
    is doc_id % 113 (~4-5 docs/group over the 500-doc fixture) while
    independent residues (%2 scheme case + utm, %3 www, %4 :443,
    %5 trailing slash, %7 ref, %11 fragment) vary the RAW form within
    each group — n_raw_forms > 1 proves the canonicalizer, not the
    generator, does the collapsing.  Scale shape: map-only projection +
    one groupBy shuffle on the canonical key; per-case expectations and
    idempotence pinned in tests/test_urls.py."""
    from steampipe_sqlite_spark.functions.urls import canonical_url

    d = F.col("doc_id")
    key = (d % 113).cast("string")
    raw = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.when(d % 2 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://")),
            F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
            F.lit("crawl.example.com"),
            F.when(d % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
            F.lit("/Articles//"),
            key,
            F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
            F.lit("?id="),
            key,
            F.when(d % 2 == 0, F.lit("&utm_source=feed&utm_medium=rss")).otherwise(
                F.lit("")
            ),
            F.when(d % 7 == 0, F.lit("&ref=homepage")).otherwise(F.lit("")),
            F.lit("&z=26&a=1"),
            F.when(d % 11 == 0, F.lit("#section-2")).otherwise(F.lit("")),
        ).alias("url"),
    )
    return (
        raw.select("doc_id", "url", canonical_url(F.col("url")).alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("url").alias("n_raw_forms"),
            F.min("doc_id").alias("keep_id"),
        )
        .orderBy("keep_id")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, source,
         list_distinct([array_to_string(list_slice(toks, i, i+2), ' ')
           FOR i IN range(1, greatest(len(toks)-2, 1)+1)]) AS grams
  FROM (SELECT doc_id, lang, source, {_DD_TOKS} AS toks FROM documents)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(len(list_intersect(a.grams, b.grams)) * 1.0 /
             greatest(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)), 1),
             4) AS jaccard
FROM t a JOIN t b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE ROUND(len(list_intersect(a.grams, b.grams)) * 1.0 /
            greatest(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)), 1),
            4) >= 0.3
ORDER BY id_a, id_b
""",
)
def dedup_ngram_jaccard_q(spark, sf_dir):
    """Exact word-3-gram Jaccard near-dup pairs, blocked by (lang, source)."""
    from steampipe_sqlite_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "text", "doc_id", ["lang", "source"], n=3, threshold=0.3
    ).orderBy("id_a", "id_b")


# Shared near-dup cluster closure: 3-gram-Jaccard blocked pairs ->
# symmetric edges -> recursive hash-min walk -> component labels.
# ONE definition so dedup_components and dedup_keep_best can never
# silently diverge on the cluster semantics (review r7).
_DD_NEARDUP_CLOSURE = """
WITH RECURSIVE t AS (
  SELECT doc_id, lang, source,
         list_distinct([array_to_string(list_slice(toks, i, i+2), ' ')
           FOR i IN range(1, greatest(len(toks)-2, 1)+1)]) AS grams
  FROM (SELECT doc_id, lang, source, {toks} AS toks FROM documents)
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE ROUND(len(list_intersect(a.grams, b.grams)) * 1.0 /
              greatest(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)), 1),
              4) >= 0.3
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
walk(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, w.comp FROM walk w JOIN edges e ON e.u = w.node
),
comps AS (SELECT node AS doc_id, MIN(comp) AS component_id FROM walk GROUP BY node)""".format(toks=_DD_TOKS)


@query(
    "dedup_components",
    oracle=_DD_NEARDUP_CLOSURE + """
SELECT doc_id, component_id,
       COUNT(*) OVER (PARTITION BY component_id) AS component_size
FROM comps ORDER BY doc_id
""",
)
def dedup_components_q(spark, sf_dir):
    """Near-duplicate CLUSTERS: word-3-gram Jaccard pairs (same edge set
    as dedup_ngram_jaccard) closed transitively via distributed hash-min
    connected components (operators/graph.py) — the keep-one-per-group
    step pair lists alone can't deliver.  Canonical label = min doc_id in
    the component; DuckDB's recursive CTE is the oracle for the closure."""
    from pyspark.sql import Window

    from steampipe_sqlite_spark.operators.dedup import ngram_jaccard_pairs
    from steampipe_sqlite_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", ["lang", "source"], n=3, threshold=0.3
    )
    comps = connected_components(
        pairs,
        src="id_a",
        dst="id_b",
        nodes=docs.select(F.col("doc_id").alias("node")),
    )
    return (
        comps.select(
            F.col("node").alias("doc_id"), F.col("component").alias("component_id")
        )
        .withColumn(
            "component_size",
            F.count(F.lit(1)).over(Window.partitionBy("component_id")),
        )
        .orderBy("doc_id")
    )


# DuckDB twin of the md5 hash family in operators/dedup.py:_hash64 —
# first 15 hex chars of md5 → 60-bit positive BIGINT (cross-engine parity
# proven by the HLL sketch rows).
_DD_H60 = "CAST('0x' || substring(md5({v}), 1, 15) AS BIGINT)"


@query(
    "dedup_cdc_chunks",
    oracle=f"""
WITH g AS (
  SELECT doc_id AS id, norm, UNNEST(generate_series(1, GREATEST(length(norm) - 7, 1))) AS i
  FROM (SELECT doc_id, {_DD_NORM} AS norm FROM documents)
),
f AS (
  SELECT id, norm, i,
         CASE WHEN CAST('0x' || substring(md5(substring(norm, CAST(i AS INT), 8)), 1, 15) AS BIGINT) % 64 = 0
              THEN 1 ELSE 0 END AS is_break
  FROM g
),
b AS (
  SELECT id, norm, i,
         COALESCE(SUM(is_break) OVER (PARTITION BY id ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
  FROM f
),
chunks AS (
  SELECT id, chunk_idx,
         CAST(MAX(i) + 7 - MIN(i) + 1 AS INT) AS chunk_len,
         md5(substring(ANY_VALUE(norm), CAST(MIN(i) AS INT), CAST(MAX(i) + 7 - MIN(i) + 1 AS INT))) AS chunk_fp
  FROM b GROUP BY id, chunk_idx
)
SELECT chunk_fp, COUNT(*) AS n_occurrences, COUNT(DISTINCT id) AS n_docs,
       MIN(id) AS first_doc, MAX(chunk_len) AS max_chunk_len
FROM chunks
GROUP BY chunk_fp HAVING COUNT(DISTINCT id) >= 2
ORDER BY chunk_fp
""",
)
def dedup_cdc_chunks_q(spark, sf_dir):
    """Partial-overlap dedup via content-defined chunking (rsync/LBFS
    breakpointing on text): documents split where the rolling 8-gram
    md5-60-bit hash ≡ 0 (mod 64), chunks fingerprinted, and every chunk
    shared by ≥2 documents reported — catches shared boilerplate and
    quotations that whole-document dedup structurally misses."""
    from steampipe_sqlite_spark.operators.dedup import cdc_chunk_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    chunks = cdc_chunk_fingerprints(docs, "text", "doc_id", k=8, divisor=64)
    return (
        chunks.groupBy("chunk_fp")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("id").alias("n_docs"),
            F.min("id").alias("first_doc"),
            F.max("chunk_len").alias("max_chunk_len"),
        )
        .where("n_docs >= 2")
        .orderBy("chunk_fp")
    )


@query(
    "dedup_minhash_lsh",
    oracle=f"""
WITH normed AS (SELECT doc_id AS id, {_DD_NORM} AS norm FROM documents),
ex AS (
  SELECT id, substring(norm, CAST(i AS INT), 5) AS s
  FROM (SELECT id, norm, UNNEST(generate_series(1, greatest(length(norm)-4, 1))) AS i
        FROM normed)
),
hashed AS (SELECT id, {_DD_H60.format(v='s')} AS h FROM ex),
pb AS (SELECT id, h // {1 << 54} AS b, MIN(h) AS mn FROM hashed GROUP BY id, b),
gm AS (SELECT id, MIN(mn) AS gmin FROM pb GROUP BY id),
sigs AS (
  SELECT gm.id, g.i, COALESCE(pb.mn, gm.gmin) AS v
  FROM gm CROSS JOIN generate_series(0, 63) g(i)
  LEFT JOIN pb ON pb.id = gm.id AND pb.b = g.i
),
bands AS (
  SELECT id, i // 4 AS band, string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS band_sig
  FROM sigs GROUP BY id, i // 4
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig AND a.id < b.id
),
score AS (
  SELECT c.id_a, c.id_b,
         ROUND(CAST(SUM(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) AS DOUBLE) / 64.0, 4)
           AS jaccard_est
  FROM cand c
  JOIN sigs sa ON sa.id = c.id_a
  JOIN sigs sb ON sb.id = c.id_b AND sb.i = sa.i
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b, jaccard_est FROM score WHERE jaccard_est >= 0.5 ORDER BY id_a, id_b
""",
)
def dedup_minhash_lsh_q(spark, sf_dir):
    """Minhash+LSH near-dup candidates, md5-60-bit hash family so the
    whole pipeline — OPH signatures, densification, banding, estimated
    Jaccard — is reproduced bit-for-bit by the DuckDB oracle.  Production
    default stays xxhash64 (same plan, faster hash; recall asserted in
    tests/test_llm_ops.py)."""
    from steampipe_sqlite_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    # orderBy, not presentation_sort: the pair set scales with duplicate
    # density (unbounded at corpus scale) — keep the parallel range sort.
    # persist() first: a range sort SAMPLES its child to pick partition
    # boundaries, which re-executes the whole scoring tail stage (the
    # broadcast joins put no shuffle boundary between dedup and sort);
    # caching the output-sized pair set makes the sampling pass a cache
    # read (measured 2.00 s → 1.62 s at sf0.1).
    pairs = persist_tracked(minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=64, bands=16, threshold=0.5,
        hash_family="md5",
    ))
    return pairs.orderBy("id_a", "id_b")


_DD_SIMHASH_COUNTS = ", ".join(f"SUM((h >> {b}) & 1) AS c{b}" for b in range(60))
_DD_SIMHASH_FP = " + ".join(
    f"(CASE WHEN c{b}*2 > n THEN CAST({1 << b} AS BIGINT) ELSE 0 END)" for b in range(60)
)


@query(
    "dedup_simhash",
    oracle=f"""
WITH toks AS (SELECT doc_id AS id, UNNEST({_DD_TOKS}) AS t FROM documents),
hashed AS (SELECT id, {_DD_H60.format(v='t')} AS h FROM toks),
votes AS (SELECT id, COUNT(*) AS n, {_DD_SIMHASH_COUNTS} FROM hashed GROUP BY id),
fps AS (SELECT id, {_DD_SIMHASH_FP} AS fp FROM votes),
bands AS (
  SELECT id, fp, k, (fp >> CAST(15*k AS INT)) & 32767 AS bv
  FROM fps, generate_series(0, 3) g(k)
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.fp AS fa, b.fp AS fb
  FROM bands a JOIN bands b ON a.k = b.k AND a.bv = b.bv AND a.id < b.id
)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= 8 ORDER BY id_a, id_b
""",
)
def dedup_simhash_q(spark, sf_dir):
    """SimHash near-dup pairs (hamming ≤ 8), md5-60-bit family: the vote
    counters, packed fingerprint, 15-bit bands, and hamming filter all
    have exact DuckDB twins.  Production default stays 64-bit xxhash64."""
    from steampipe_sqlite_spark.operators.dedup import simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    # orderBy + output-sized persist: see dedup_minhash_lsh (range-sort
    # sampling re-executes the post-shuffle tail otherwise).
    pairs = persist_tracked(simhash_pairs(
        docs, "text", "doc_id", max_hamming=8, hash_family="md5"
    ))
    return pairs.orderBy("id_a", "id_b")


# --- Similarity search ----------------------------------------------------

_DD_COS = (
    "ROUND(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) / "
    "(SQRT(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) * "
    "SQRT(list_inner_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 4)"
)


@query(
    "knn_cosine_bruteforce",
    oracle=f"""
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_DD_COS} AS cosine,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id
                            ORDER BY {_DD_COS} DESC, b.vec_id) AS rank
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 10
) t
WHERE rank <= 5
ORDER BY query_id, rank
""",
)
def knn_bruteforce_q(spark, sf_dir):
    """Exact cosine top-5 neighbors for the first 10 vectors (broadcast
    query side; corpus scanned once)."""
    from steampipe_sqlite_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return presentation_sort(
        brute_force_topk(emb, queries, "embedding", "vec_id", k=5),
        ["query_id", "rank"],
    )


@query(
    "knn_cosine_blas",
    oracle=f"""
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_DD_COS} AS cosine,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id
                            ORDER BY {_DD_COS} DESC, b.vec_id) AS rank
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 10
) t
WHERE rank <= 5
ORDER BY query_id, rank
""",
)
def knn_blas_q(spark, sf_dir):
    """Exact cosine top-5 via per-partition BLAS GEMM + partial top-k
    (mapInPandas) — result-identical to knn_cosine_bruteforce (same
    oracle), but the per-pair scoring runs vectorized instead of as an
    interpreted expression fold: the shape that holds up when the corpus
    is 10^9 vectors."""
    from steampipe_sqlite_spark.operators.similarity import blas_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return presentation_sort(
        blas_topk(emb, queries, "embedding", "vec_id", k=5),
        ["query_id", "rank"],
    )


@query(
    "knn_cosine_int8",
    oracle="""
WITH qz AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
           x -> round(x * (127.0 / greatest(
                  list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                          y -> abs(y))), 1e-30)))) AS qv
  FROM embeddings
),
n AS (SELECT vec_id, qv, sqrt(list_inner_product(qv, qv)) AS qn FROM qz)
SELECT query_id, neighbor_id, cosine_q, rank FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROUND(list_inner_product(a.qv, b.qv) / (a.qn * b.qn), 4) AS cosine_q,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY ROUND(list_inner_product(a.qv, b.qv) / (a.qn * b.qn), 4)
                      DESC, b.vec_id) AS rank
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 10
) t
WHERE rank <= 5
ORDER BY query_id, rank
""",
)
def knn_int8_q(spark, sf_dir):
    """Cosine top-5 over symmetric-int8-quantized embeddings (4× smaller
    corpus at scale; integer dot products).  Quantized cosine is
    scale-invariant — no dequantization — and integer sums are exact in
    both engines, so this is fully hash-checkable."""
    from steampipe_sqlite_spark.operators.similarity import int8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return int8_topk(emb, queries, "embedding", "vec_id", k=5).orderBy(
        "query_id", "rank"
    )


@query(
    "emb_neardup_cosine",
    oracle=f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_DD_COS} AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_DD_COS} >= 0.35
ORDER BY id_a, id_b
""",
)
def emb_neardup_q(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (τ=0.35)."""
    from steampipe_sqlite_spark.operators.dedup import embedding_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, "embedding", "vec_id", threshold=0.35).orderBy(
        "id_a", "id_b"
    )


def _knn_lsh_oracle() -> str:
    """DuckDB twin of lsh_topk(n_planes=3, n_tables=12): the same seeded
    hyperplanes inlined as literals (repr round-trips doubles exactly),
    sign-bit buckets, bucket-collision candidates, exact cosine re-rank."""
    from steampipe_sqlite_spark.operators.similarity import hyperplanes

    def ip(plane):
        arr = ", ".join(repr(float(x)) for x in plane)
        return f"list_inner_product(CAST(embedding AS DOUBLE[]), [{arr}])"

    def bucket(planes):
        return " + ".join(
            f"(CASE WHEN {ip(p)} > 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )

    tables = [hyperplanes(64, 3, seed=42 + t) for t in range(12)]
    buckets = "\nUNION ALL\n".join(
        f"SELECT vec_id, {t} AS tbl, {bucket(p)} AS bucket FROM embeddings"
        for t, p in enumerate(tables)
    )
    return f"""
WITH buckets AS (
{buckets}
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM buckets q JOIN buckets c
    ON q.tbl = c.tbl AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
  WHERE q.vec_id < 10
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, {_DD_COS} AS cosine
  FROM cand JOIN embeddings a ON a.vec_id = cand.query_id
            JOIN embeddings b ON b.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored) t
WHERE rank <= 5
ORDER BY query_id, rank
"""


@query("knn_cosine_lsh", oracle=_knn_lsh_oracle())
def knn_lsh_q(spark, sf_dir):
    """Hyperplane-LSH approximate top-5 (12 tables × 3 planes — measured
    recall 1.0 at this corpus size; planes scale ~log2(corpus/bucket)
    upward with data).  Fully deterministic (seeded planes, sign buckets,
    4-dp cosine), so the whole ANN pipeline is oracle-checked; recall vs
    brute force additionally asserted in tests/test_llm_ops.py."""
    from steampipe_sqlite_spark.operators.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(
        emb, queries, "embedding", "vec_id", k=5, n_planes=3, n_tables=12
    ).orderBy("query_id", "rank")


@query(
    "emb_centroid_per_label",
    oracle="""
SELECT label, i - 1 AS pos,
       CAST(SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000000.0) AS BIGINT)) AS DOUBLE)
         / COUNT(*) / 1000000000.0 AS avg_val
FROM embeddings, UNNEST(GENERATE_SERIES(1, 64)) AS t(i)
GROUP BY label, i
ORDER BY label, pos
""",
)
def emb_centroid_q(spark, sf_dir):
    """Per-label centroid, one row per (label, dimension) — posexplode +
    exact integer-nanos mean.  Values are scaled ROUND(x·1e9)→BIGINT (the
    corpus money convention at nano precision): the round sees the SAME
    IEEE double on both engines, so the conversion is bit-identical —
    unlike a double→DECIMAL(18,9) cast, whose half-way handling differed
    between engines on ~1 in 10⁴ float32 values (caught at sf0.1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = F.count(F.lit(1))
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.round(F.col("val").cast("double") * 1e9).cast("long")).cast("double")
                / n
                / 1e9
            ).alias("avg_val")
        )
        .orderBy("label", "pos")
    )


def _dd_cos(x: str, y: str) -> str:
    return (
        f"ROUND(list_inner_product(CAST({x}.embedding AS DOUBLE[]), CAST({y}.embedding AS DOUBLE[])) / "
        f"(SQRT(list_inner_product(CAST({x}.embedding AS DOUBLE[]), CAST({x}.embedding AS DOUBLE[]))) * "
        f"SQRT(list_inner_product(CAST({y}.embedding AS DOUBLE[]), CAST({y}.embedding AS DOUBLE[])))), 4)"
    )


def _dd_kmeans_ctes(k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """DuckDB CTE chain replicating operators/clustering.kmeans_assign with
    the iterations UNROLLED (fixed count is what makes the fit
    oracle-checkable): v → c0 (first-k init) → [assign aN / update cN+1]
    × iters; the final assignment CTE is named ``afinal``.

    Distance/mean/tie-break compositions mirror the Spark operators term
    by term — see clustering.py's determinism contract."""

    def d2(vv: str, v: str, c: str) -> str:
        return f"ROUND({vv} - 2 * list_inner_product({v}, {c}.cv) + {c}.cc, 4)"

    def assign(name: str, cent: str) -> str:
        return f"""{name} AS (
  SELECT id, v, vv, cell, d2 FROM (
    SELECT v.id, v.v, v.vv, c.cid AS cell,
           {d2('v.vv', 'v.v', 'c')} AS d2,
           ROW_NUMBER() OVER (PARTITION BY v.id
                              ORDER BY {d2('v.vv', 'v.v', 'c')}, c.cid) AS r
    FROM v CROSS JOIN {cent} c) t
  WHERE r = 1
)"""

    def update(name: str, prev: str) -> str:
        return f"""{name} AS (
  SELECT cell AS cid, LIST(avg_val ORDER BY pos) AS cv,
         list_inner_product(LIST(avg_val ORDER BY pos), LIST(avg_val ORDER BY pos)) AS cc
  FROM (
    SELECT a.cell, i - 1 AS pos,
           CAST(SUM(CAST(ROUND(a.v[i] * 1000000000.0) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 1000000000.0 AS avg_val
    FROM {prev} a, UNNEST(GENERATE_SERIES(1, {dim})) AS t(i)
    GROUP BY a.cell, i) s
  GROUP BY cell
)"""

    parts = [
        """v AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS vv
  FROM embeddings
)""",
        f"c0 AS (SELECT id AS cid, v AS cv, vv AS cc FROM v WHERE id < {k})",
        assign("a0", "c0"),
    ]
    for t in range(1, iters):
        parts.append(update(f"c{t}", f"a{t - 1}"))
        parts.append(assign(f"a{t}", f"c{t}"))
    parts.append(f"afinal AS (SELECT * FROM a{iters - 1})")
    return "WITH " + ",\n".join(parts)


@query(
    "cluster_kmeans",
    oracle=f"""
{_dd_kmeans_ctes()}
SELECT id AS vec_id, cell AS cluster, d2 AS dist_sq
FROM afinal
ORDER BY vec_id
""",
)
def cluster_kmeans_q(spark, sf_dir):
    """Lloyd k-means (k=8, 2 fixed rounds, first-k init) over the
    embeddings — the full fit (both assignment rounds AND the decimal-mean
    centroid update between them) is replayed by the unrolled-CTE oracle,
    so the whole iterative pipeline is hash-checked."""
    from steampipe_sqlite_spark.operators.clustering import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        kmeans_assign(emb, "embedding", "vec_id", k=8, iters=2)
        .select(
            F.col("id").alias("vec_id"),
            F.col("cell").alias("cluster"),
            F.col("d2").alias("dist_sq"),
        )
        .orderBy("vec_id")
    )


@query(
    "dedup_semantic",
    oracle=f"""
{_dd_kmeans_ctes()},
reps AS (
  SELECT cell AS rcell, id AS rep_id FROM (
    SELECT cell, id, ROW_NUMBER() OVER (PARTITION BY cell ORDER BY d2, id) AS r
    FROM afinal) t
  WHERE r = 1
),
scored AS (
  SELECT a.id AS vec_id, a.cell AS cluster, a.id = r.rep_id AS is_rep,
         CASE WHEN a.id = r.rep_id THEN NULL
              ELSE ROUND(list_inner_product(a.v, rv.v) / (SQRT(a.vv) * SQRT(rv.vv)), 4)
         END AS cos_to_rep
  FROM afinal a
  JOIN reps r ON a.cell = r.rcell
  JOIN afinal rv ON rv.id = r.rep_id
)
SELECT vec_id, cluster, is_rep, cos_to_rep
FROM scored
WHERE is_rep OR cos_to_rep < 0.30
ORDER BY vec_id
""",
)
def dedup_semantic_q(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings, keep
    each cluster's centroid-nearest representative, drop members whose
    cosine to it is ≥ τ.  Linear pair space (representative × members);
    the oracle replays clustering, representative choice, and the cosine
    prune.  τ=0.30 here ≈ the p90 cos-to-rep of the synthetic fixture
    (max 0.49 — real corpora use ~0.95), so the prune branch is exercised:
    ~10% of vectors drop."""
    from steampipe_sqlite_spark.operators.clustering import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, "embedding", "vec_id", k=8, iters=2, tau=0.30
    ).orderBy("vec_id")


# Shared by knn_cosine_ivf (direct operator) and knn_ivf_index_persisted
# (build-then-query through the hive-partitioned on-disk index): the index
# path's assignment semantics are exactly ivf_topk's (shared
# _assign_cells_gemm; bit-identity pinned by
# tests/test_llm_ops.py::TestIvfIndexPersistence), so one oracle covers
# both and the driver checks the persisted lifecycle end-to-end.
_IVF_TOPK_ORACLE = f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 16
),
corpus_assign AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_dd_cos('e', 'c')} DESC, c.cid) AS r
    FROM embeddings e CROSS JOIN cent c
  ) t WHERE r = 1
),
probes AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_dd_cos('e', 'c')} DESC, c.cid) AS r
    FROM embeddings e CROSS JOIN cent c
    WHERE e.vec_id < 10
  ) t WHERE r <= 3
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         {_dd_cos('q', 'a')} AS cosine,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY {_dd_cos('q', 'a')} DESC, a.vec_id) AS rank
  FROM probes q JOIN corpus_assign a ON q.cell = a.cell AND q.vec_id <> a.vec_id
) t
WHERE rank <= 5
ORDER BY query_id, rank
"""


@query("knn_cosine_ivf", oracle=_IVF_TOPK_ORACLE)
def knn_ivf_q(spark, sf_dir):
    """IVF approximate top-5 (16 cells, nprobe=3, deterministic first-N
    centroids) — the whole inverted-file pipeline is mirrored in the
    DuckDB oracle, so assignment, probing, and re-rank are all checked."""
    from steampipe_sqlite_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return presentation_sort(
        ivf_topk(emb, queries, "embedding", "vec_id", k=5, n_cells=16, nprobe=3),
        ["query_id", "rank"],
    )


def _ensure_index(
    sf_dir: str, kind: str, build_fn, parts: tuple[str, ...]
) -> str:
    """Build a persisted ANN index under repo-local ``.cache/indexes``
    exactly once per (fixture content, kind) and return its path.

    Same discipline as the layout catalog (tables.py): the path is keyed
    on the embeddings fixture's identity via ``tables._source_identity``
    (recursive listing for directory-shaped fixtures — a top-level stat
    misses in-place part-file rewrites), so a regenerated fixture gets a
    NEW path instead of a stale read and different SFs never collide; the
    build is serialized by an exclusive flock on ``<path>.writing`` and
    completed by an engine-owned marker written AFTER the data commits —
    so concurrent plan constructions (parallel selfcheck chunks, bench
    alongside a sweep, pytest) can't tear each other's files, and
    re-constructions of an unchanged fixture skip the rebuild.
    Completeness = marker AND every ``parts`` subdir present: a torn
    manual deletion that leaves the marker must trigger a rebuild, not a
    permanent PATH_NOT_FOUND.  Superseded generations (other keys of the
    same kind) are reclaimed after a successful ensure — DEFERRED behind
    a grace period: readers (ivf_query_index probe scans) hold no flock,
    so an immediate rmtree could FileNotFound a concurrent process
    mid-scan over the old generation — the same hazard class
    tables._sweep_trash fixed for layouts (ADVICE r11/r12).  A
    superseded dir is first tombstoned (``_sgs_index_superseded``
    mtime = supersession time) and its files removed only by a later
    ensure once the tombstone outlives tables._reclaim_grace_s(),
    still skipping any generation a concurrent builder holds flocked."""
    import fcntl
    import glob
    import hashlib
    import os
    import shutil
    import time

    from steampipe_sqlite_spark.tables import (
        _reclaim_grace_s,
        _source_identity,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    ident = _source_identity(src)
    # two-part key: fixture PATH hash names the family (distinct SFs are
    # distinct families, all live — never each other's garbage), fixture
    # CONTENT hash names the generation (a regenerated fixture supersedes
    # its own family's previous generation, which becomes reclaimable)
    fam = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:8]
    key = hashlib.md5(
        f"{ident['size']}|{ident['mtime_ns']}".encode()
    ).hexdigest()[:12]
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    root = os.path.join(repo, ".cache", "indexes")
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"{kind}_{fam}_{key}")
    marker = os.path.join(path, "_sgs_index_complete")

    def _complete() -> bool:
        return os.path.exists(marker) and all(
            os.path.isdir(os.path.join(path, p)) for p in parts
        )

    wl = os.open(f"{path}.writing", os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(wl, fcntl.LOCK_EX)
        if not _complete():
            try:
                os.remove(marker)  # torn dir must not look complete mid-build
            except OSError:
                pass
            build_fn(path)
            with open(marker, "w"):
                pass
    finally:
        fcntl.flock(wl, fcntl.LOCK_UN)
        os.close(wl)
        # the .writing lockfile stays on disk: unlinking a lockfile races
        # with a concurrent opener (see tables._sweep_trash)
    # a fixture reverted to a previously-seen content hash resurrects its
    # old generation: clear any tombstone so a later sweep can't reclaim
    # the index we just served
    try:
        os.remove(os.path.join(path, "_sgs_index_superseded"))
    except OSError:
        pass
    # reclaim superseded generations WITHIN THIS FAMILY ONLY (same fixture
    # path, older content) — sibling SFs' indexes are live, not garbage.
    # Two-phase: tombstone on first sighting, rmtree only once the
    # tombstone has outlived the grace period (in-flight probe scans over
    # the old generation drain in the meantime — see docstring).
    for old in glob.glob(os.path.join(root, f"{kind}_{fam}_*")):
        if old == path or old.endswith(".writing"):
            continue
        tomb = os.path.join(old, "_sgs_index_superseded")
        try:
            tomb_age = time.time() - os.path.getmtime(tomb)
        except OSError:
            # first sighting as superseded: tombstone and leave the files
            try:
                with open(tomb, "w"):
                    pass
            except OSError:
                pass  # dir vanished under us (another process reclaimed)
            continue
        if tomb_age < _reclaim_grace_s():
            continue  # grace window still open for in-flight scans
        owl = None
        try:
            owl = os.open(f"{old}.writing", os.O_CREAT | os.O_RDWR)
            fcntl.flock(owl, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            if owl is not None:
                os.close(owl)
            continue  # a concurrent process is using/building it
        try:
            try:
                os.remove(os.path.join(old, "_sgs_index_complete"))
            except OSError:
                pass
            shutil.rmtree(old, ignore_errors=True)
        finally:
            fcntl.flock(owl, fcntl.LOCK_UN)
            os.close(owl)
    return path


@query("knn_ivf_index_persisted", oracle=_IVF_TOPK_ORACLE)
def knn_ivf_index_persisted_q(spark, sf_dir):
    """Persisted-IVF serving lifecycle as a driver-checkable witness
    (VERDICT r11 #5): build the on-disk index (centroids parquet + cells
    hive-partitioned BY CELL), then answer top-5 THROUGH it with
    ivf_query_index's partition-pruned probe scan.  Parameters are
    knn_cosine_ivf's exactly (16 first-N centroids, nprobe=3, queries
    vec_id<10), and the index path shares ivf_topk's assignment semantics
    (similarity.py _assign_cells_gemm), so the direct operator's oracle
    replays this result value-for-value — the build/read-back/prune
    machinery is what's newly under test.  At 10^9 vectors the probe
    reads nprobe/n_cells of the index directories and nothing else."""
    from steampipe_sqlite_spark.operators.similarity import (
        ivf_build_index,
        ivf_query_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = _ensure_index(
        sf_dir, "ivf16",
        lambda p: ivf_build_index(emb, "embedding", "vec_id", p, n_cells=16),
        parts=("centroids", "cells"),
    )
    queries = emb.filter(F.col("vec_id") < 10)
    return presentation_sort(
        ivf_query_index(
            spark, path, queries, "embedding", "vec_id", k=5, nprobe=3
        ),
        ["query_id", "rank"],
    )


@query(
    "text_tfidf_top_terms",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, UNNEST({_DD_TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * LN(n.n_docs * 1.0 / df.df), 4) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, tfidf, rnk FROM (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
  FROM scored
) t
WHERE rnk <= 3
ORDER BY doc_id, rnk
""",
)
def text_tfidf_top_terms(spark, sf_dir):
    """Per-document top-3 TF-IDF terms — the classic signal-term extractor
    for corpus curation.  Shape: one explode + two hash aggregations (tf
    per doc-term, df per term) + a broadcast-size df join; the doc-count
    scalar folds in as a literal cross join.  All linear, skew-free (term
    df is bounded by doc count), and entirely JVM-side."""
    from steampipe_sqlite_spark.functions.text import tokens
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = docs.count()
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    )


# --- sketches -------------------------------------------------------------

from steampipe_sqlite_spark.functions.sketches import (  # noqa: E402
    hist_quantiles,
    hist_quantiles_oracle_sql,
    hll_distinct,
    hll_oracle_sql,
)


@query(
    "sketch_hll_users",
    oracle=hll_oracle_sql("SELECT user_id FROM events", "user_id", p=10),
)
def sketch_hll_users(spark, sf_dir):
    """Deterministic HyperLogLog (md5-based, 1024 registers) estimating
    distinct users — constant-memory cardinality at any scale, and the
    exact same estimate reproduced by the DuckDB oracle (both engines
    share md5/hex/bin primitives bit-for-bit)."""
    events = load_table(spark, sf_dir, "events")
    return hll_distinct(events.select("user_id"), "user_id", p=10)


@query(
    "sketch_topk_tokens",
    oracle=f"""
WITH tok AS (SELECT UNNEST({_DD_TOKS}) AS term FROM documents),
counted AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term)
SELECT term, cnt, rank FROM (
  SELECT term, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS rank
  FROM counted
) t WHERE rank <= 20
ORDER BY rank
""",
)
def sketch_topk_tokens(spark, sf_dir):
    """Heavy-hitters top-20 corpus tokens via per-partition Misra–Gries
    summaries + exact candidate recount (functions/sketches.frequent_terms)
    — shuffle bounded by the summary capacity per partition instead of the
    distinct-term count.  Exact (and therefore oracle-checkable) whenever
    the 20th term's frequency clears n/capacity, which any natural-language
    head distribution does; the truncation mechanics are pinned separately
    on skewed synthetic data in tests/test_llm_ops.py."""
    from steampipe_sqlite_spark.functions.sketches import frequent_terms
    from steampipe_sqlite_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    return frequent_terms(tok, "term", k=20, capacity=256).orderBy("rank")


@query(
    "sketch_hll_doc_texts",
    oracle=hll_oracle_sql("SELECT text FROM documents", "text", p=10),
)
def sketch_hll_doc_texts(spark, sf_dir):
    """HLL distinct-text estimate over documents (near-dup corpora make
    exact distinct counts expensive; the sketch is one narrow shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return hll_distinct(docs.select("text"), "text", p=10)


@query(
    "dataset_shuffle_shards",
    oracle="""
SELECT doc_id,
       CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15) AS BIGINT) % 16 AS shard,
       CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15) AS BIGINT) AS sort_key
FROM documents
ORDER BY shard, sort_key, doc_id
""",
)
def dataset_shuffle_shards(spark, sf_dir):
    """Deterministic global shuffle + sharding for training data: each
    document gets a content-keyed 60-bit md5 value; shard = value mod 16,
    within-shard order = the value itself.  Pure projection — NO window,
    NO stateful shuffle — so it is embarrassingly parallel at any scale,
    and the shuffle order is reproducible across runs, engines, and
    cluster sizes (re-running an interrupted epoch yields byte-identical
    shard files).  The md5-prefix→long trick is the HLL oracle's shared
    primitive, so DuckDB replays it bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col("doc_id"), F.col("text"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (
        docs.select(
            "doc_id",
            F.pmod(h, F.lit(16)).alias("shard"),
            h.alias("sort_key"),
        )
        .orderBy("shard", "sort_key", "doc_id")
    )


@query(
    "sketch_hll_users_by_type",
    oracle=hll_oracle_sql(
        "SELECT event_type, user_id FROM events", "user_id", p=10,
        group_cols=["event_type"],
    ),
)
def sketch_hll_users_by_type(spark, sf_dir):
    """Per-group HLL: distinct users per event_type from one pass — the
    grouped register arrays are what make the sketch mergeable (a group's
    sketch is the element-wise max of its shards), the property that lets
    100 TB cardinality roll up without re-scanning."""
    events = load_table(spark, sf_dir, "events")
    return hll_distinct(
        events.select("event_type", "user_id"), "user_id", p=10,
        group_cols=["event_type"],
    )


@query(
    "sketch_quantile_hist",
    oracle=hist_quantiles_oracle_sql(
        "SELECT o_totalprice FROM orders", "o_totalprice", bins=64
    ),
)
def sketch_quantile_hist(spark, sf_dir):
    """Histogram-sketch percentiles of o_totalprice (64 fixed-width bins,
    linear interpolation) — the mergeable constant-memory alternative to
    exact percentile sorts; the oracle replays the identical arithmetic,
    so the estimates hash-match."""
    orders = load_table(spark, sf_dir, "orders")
    return hist_quantiles(orders, "o_totalprice", bins=64)


@query(
    "curation_pipeline",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang, n_chars,
         len({_DD_TOKS}) AS n_tokens,
         md5({_DD_NORM}) AS fp,
         ROUND((
           (CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0 ELSE 0.5 END)
           + (CASE WHEN length(text)*1.0/greatest(len({_DD_TOKS}),1) BETWEEN 3.0 AND 12.0
                   THEN 1.0 ELSE 0.5 END)
           + len(regexp_extract_all(text,'[A-Za-z]'))*1.0/greatest(length(text),1)
         ) / 3.0, 4) AS quality
  FROM documents
  WHERE lang IN ('en', 'de', 'fr', 'es')
),
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM scored WHERE quality >= 0.6
  ) t WHERE rn = 1
),
budgeted AS (
  SELECT doc_id, lang, n_tokens, quality,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_tokens
  FROM deduped
)
SELECT doc_id, lang, n_tokens, quality, cum_tokens
FROM budgeted
WHERE cum_tokens <= 5000
ORDER BY lang, quality DESC, doc_id
""",
)
def curation_pipeline(spark, sf_dir):
    """End-to-end corpus curation in one Catalyst plan: language filter →
    quality gate → exact dedup (keep lowest doc_id per fingerprint) →
    per-language token budget (greedy by quality, running-sum window).
    Every stage is an operator from this engine's toolkit composed
    declaratively — one scan, two hash shuffles (fingerprint, lang), no
    Python.  The shape a 100 TB pretraining-data pass actually uses."""
    from steampipe_sqlite_spark.functions.text import _NORM_SQL

    # SQL-string twins of text.token_count/fingerprint/quality_score —
    # identical expression trees (same casts, same addition order, so the
    # doubles are bit-equal), composed as staged selectExpr calls instead
    # of ~50 py4j Column calls (measured 0.17 s of construction per build).
    #
    # Two plan-shape rules learned in round 9 (each worth ~0.2 s at sf0.1,
    # multiplicative at 100 TB where the regex chain dominates the scan):
    # 1. STAGE the normalizer: _norm is aliased in its own projection and
    #    referenced 2× downstream, so CollapseProject's cheapness guard
    #    keeps it materialized ONCE (the flat form's plan text carried 6
    #    copies of the 2-regex chain; codegen CSE recovered some but not
    #    the CASE-branch copies, which subexpressionElimination skips).
    # 2. NO quality Filter between the projection and the fp window:
    #    Catalyst substitutes alias definitions when pushing a filter
    #    through a projection, re-evaluating the full scoring chain inside
    #    the Filter operator.  The gate rides the dedup window instead:
    #    row_number ordered by (disqualified-last, doc_id) makes rn=1 the
    #    lowest qualifying doc_id whenever one exists, and the combined
    #    `quality >= 0.6 AND rn = 1` filter sits ABOVE the window, where a
    #    non-partition-column predicate cannot be pushed.  Semantics
    #    identical to filter-then-dedup; row_number (unlike a conditional
    #    SUM rank) keeps the WindowGroupLimit rewrite, so each map
    #    partition pre-prunes to one row per fingerprint BEFORE the
    #    exchange — at 100 TB the fp shuffle moves ≤1 row per (fp,
    #    partition) instead of every duplicate.  Measured 0.85 → 0.62 s
    #    at sf0.1.
    norm = _NORM_SQL.format(c="text")
    docs = load_table(spark, sf_dir, "documents")
    s1 = docs.where("lang IN ('en', 'de', 'fr', 'es')").selectExpr(
        "doc_id",
        "lang",
        "length(text) AS _len",
        "cast(regexp_count(text, '[A-Za-z]') AS double) AS _alpha",
        f"{norm} AS _norm",
    )
    s2 = s1.selectExpr(
        "doc_id",
        "lang",
        "_len",
        "_alpha",
        "size(split(_norm, ' ')) AS n_tokens",
        "md5(_norm) AS fp",
    )
    scored = s2.selectExpr(
        "doc_id",
        "lang",
        "n_tokens",
        "fp",
        "round((CASE WHEN _len >= 100 AND _len <= 5000 THEN 1.0 ELSE 0.5 END"
        " + CASE WHEN (cast(_len AS double) / greatest(n_tokens, 1)) >= 3.0"
        " AND (cast(_len AS double) / greatest(n_tokens, 1)) <= 12.0"
        " THEN 1.0 ELSE 0.5 END"
        " + _alpha / greatest(_len, 1)) / 3.0, 4) AS quality",
    )
    deduped = scored.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY fp"
        " ORDER BY CASE WHEN quality >= 0.6 THEN 0 ELSE 1 END, doc_id) AS rn",
    ).where("quality >= 0.6 AND rn = 1")
    # explicit bigint on BOTH sides: DuckDB's window SUM yields HUGEINT,
    # which round-trips through pandas as float/object and flips the
    # driver's value hash even when the numbers are equal (VERDICT r1).
    out = deduped.selectExpr(
        "doc_id",
        "lang",
        "n_tokens",
        "quality",
        "cast(sum(n_tokens) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint) AS cum_tokens",
    ).where("cum_tokens <= 5000")
    return presentation_sort(out, ["lang", F.desc("quality"), "doc_id"])


@query(
    "sample_stratified_md5",
    oracle="""
SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS first_doc
FROM documents
WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 20
GROUP BY lang
ORDER BY lang
""",
)
def sample_stratified_md5(spark, sf_dir):
    """Deterministic 20% sample via md5-hash gating — unlike seeded RNG
    sampling, the same rows are kept on every engine, every cluster size,
    every partitioning (hash-gating is THE reproducible-sampling idiom for
    training data).  Map-only: no shuffle until the per-stratum rollup."""
    docs = load_table(spark, sf_dir, "documents")
    gate = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    return (
        docs.filter(gate < 20)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.min("doc_id").alias("first_doc"))
        .orderBy("lang")
    )


@query(
    "sample_weighted_md5",
    oracle="""
WITH mx AS (SELECT MAX(n_chars) AS max_chars FROM documents),
kept AS (
  SELECT d.doc_id, d.lang, d.n_chars
  FROM documents d, mx
  WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
          / 4294967296.0
        < 0.5 * d.n_chars / mx.max_chars
)
SELECT lang, COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
       MIN(doc_id) AS first_doc
FROM kept GROUP BY lang ORDER BY lang
""",
)
def sample_weighted_md5(spark, sf_dir):
    """Weight-proportional deterministic sampling: each document keeps with
    probability 0.5·w/w_max (w = n_chars) gated by an md5-derived uniform —
    the reproducible analog of weighted Bernoulli sampling for quality- or
    length-weighted corpus mixes.  Every operation is a division or
    comparison of identical operands (no transcendentals), so keep
    decisions are bit-identical across engines, cluster sizes, and
    partitionings.  The global max weight arrives via a broadcast 1-row
    aggregate (the scalar-join shape) — map-only otherwise."""
    docs = load_table(spark, sf_dir, "documents")
    mx = docs.selectExpr("max(n_chars) AS max_chars")
    u = "conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) / 4294967296.0"
    return (
        docs.crossJoin(F.broadcast(mx))
        .where(f"{u} < 0.5 * n_chars / max_chars")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("long").alias("chars_kept"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang")
    )


@query(
    "dedup_incremental",
    oracle="""
WITH hist AS (
  SELECT DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\\x{4e00}-\\x{9fff} ]',' ','g'),'\\s+',' ','g'))) AS fp
  FROM documents WHERE doc_id < 250
),
batch AS (
  SELECT doc_id, source,
         md5(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\\x{4e00}-\\x{9fff} ]',' ','g'),'\\s+',' ','g'))) AS fp
  FROM documents WHERE doc_id >= 250
)
SELECT b.source,
       COUNT(*) AS n_new,
       COUNT(*) FILTER (WHERE h.fp IS NOT NULL) AS n_dup_vs_history,
       MIN(b.doc_id) AS first_new
FROM batch b LEFT JOIN hist h ON b.fp = h.fp
GROUP BY b.source
ORDER BY b.source
""",
)
def dedup_incremental_q(spark, sf_dir):
    """Incremental-ingestion dedup: an arriving batch (doc_id >= 250) is
    checked against the HISTORICAL fingerprint store (doc_id < 250 stands
    in) — the daily-pipeline shape where history is a bucketed fingerprint
    table and the join is fingerprint-colocated, never a rescan of the
    historical corpus.  Same md5(normalized) fingerprint as dedup_exact."""
    from steampipe_sqlite_spark.functions.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    hist = (
        docs.filter(F.col("doc_id") < 250)
        .select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .withColumn("in_hist", F.lit(1))
    )
    batch = docs.filter(F.col("doc_id") >= 250).select(
        "doc_id", "source", fingerprint(F.col("text")).alias("fp")
    )
    return (
        batch.join(hist, "fp", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.count("in_hist").alias("n_dup_vs_history"),
            F.min("doc_id").alias("first_new"),
        )
        .orderBy("source")
    )


@query(
    "profile_documents",
    oracle="""
SELECT 'doc_id' AS col, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(doc_id) AS n_null,
       COUNT(DISTINCT doc_id) AS n_distinct,
       CAST(MIN(doc_id) AS VARCHAR) AS min_val,
       CAST(MAX(doc_id) AS VARCHAR) AS max_val
FROM documents
UNION ALL
SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
       MIN(lang), MAX(lang) FROM documents
UNION ALL
SELECT 'source', COUNT(*), COUNT(*) - COUNT(source), COUNT(DISTINCT source),
       MIN(source), MAX(source) FROM documents
UNION ALL
SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
       CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
ORDER BY col
""",
)
def profile_documents(spark, sf_dir):
    """Dataset profiler: per-column row/null/distinct counts and min/max —
    the health-check pass run before a corpus enters training.  One scan,
    one aggregation (all four column profiles fold in a single groupBy-less
    agg, then pivot to rows), values stringified for a uniform schema."""
    docs = load_table(spark, sf_dir, "documents")
    aggs = []
    for c in ["doc_id", "lang", "source", "n_chars"]:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = docs.agg(*aggs)
    parts = ", ".join(
        f"struct('{c}' as col, {c}__rows as n_rows, {c}__null as n_null,"
        f" {c}__distinct as n_distinct, {c}__min as min_val, {c}__max as max_val)"
        for c in ["doc_id", "lang", "source", "n_chars"]
    )
    return (
        wide.select(F.expr(f"inline(array({parts}))"))
        .orderBy("col")
    )


@query(
    "sample_balanced_per_group",
    oracle="""
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) t
WHERE rk <= 20
ORDER BY lang, doc_id
""",
)
def sample_balanced_per_group(spark, sf_dir):
    """Balanced subsample: exactly min(20, group size) docs per language,
    chosen by md5 rank — deterministic across engines/partitionings where
    seeded RNG is not, and it yields a FIXED per-class budget (class
    rebalancing) where the hash-gate sampler keeps a fixed fraction.
    One shuffle on the group key."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


@query(
    "pack_length_buckets",
    plan_cache=False,  # bakes distributed-helper offsets; see registry.query
    oracle="""
WITH t AS (
  SELECT doc_id, n_chars,
         ntile(16) OVER (ORDER BY n_chars, doc_id) AS bucket
  FROM documents
)
SELECT bucket, COUNT(*) AS n_docs,
       MIN(n_chars) AS min_len, MAX(n_chars) AS max_len,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MAX(n_chars) * COUNT(*) - SUM(n_chars) AS BIGINT) AS padding_waste
FROM t GROUP BY bucket ORDER BY bucket
""",
)
def pack_length_buckets(spark, sf_dir):
    """Length-bucketed batching: documents ntile'd into 16 length buckets
    so fixed-shape training batches pad to the BUCKET max, not the global
    max — padding_waste quantifies the saving.

    Scale shape: NO global-window ntile — Spark's empty-OVER WindowExec
    moves every row to one partition (VERDICT r6 flagged the earlier
    spelling's "range-partitioned" claim as false, and it was).  The
    global rank comes from operators/scale.distributed_row_number (range
    shuffle + per-partition rank + driver-prefix-summed offsets), and the
    bucket is the explicit SQL-standard NTILE formula over (rn, n): the
    first n%16 buckets take ceil(n/16) rows, the rest floor(n/16) —
    identical remainder placement to both engines' NTILE.  At 100 TB the
    same statistics could come from a quantile sketch instead of a full
    rank; this form stays exact."""
    from steampipe_sqlite_spark.operators.scale import distributed_row_number

    docs = load_table(spark, sf_dir, "documents")
    ranked = distributed_row_number(
        docs.select("doc_id", "n_chars"), ["n_chars", "doc_id"], name="rn"
    )
    n = ranked._sgs_total_rows
    q, r = divmod(n, 16)
    # NTILE(16): rows 1..r*(q+1) fill the r big buckets, remainder the
    # small ones; greatest(q,1) guards the (unreachable when rn>r*(q+1))
    # divide-by-zero branch for n < 16.
    t = ranked.selectExpr(
        "doc_id",
        "n_chars",
        f"CAST(CASE WHEN rn <= {r * (q + 1)} THEN (rn - 1) div {q + 1} + 1"
        f" ELSE {r} + (rn - {r * (q + 1)} - 1) div {max(q, 1)} + 1 END"
        " AS INT) AS bucket",
    )
    return (
        t.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_len"),
            F.max("n_chars").alias("max_len"),
            F.sum("n_chars").alias("total_chars"),
            (F.max("n_chars") * F.count(F.lit(1)) - F.sum("n_chars")).alias(
                "padding_waste"
            ),
        )
        .orderBy("bucket")
    )


@query(
    "text_chunk_sliding",
    oracle=f"""
WITH base AS (SELECT doc_id, {_DD_TOKS} AS toks FROM documents),
idx AS (
  SELECT doc_id, toks,
         UNNEST(generate_series(0, (GREATEST(len(toks) - 32, 0) + 23) // 24)) AS chunk_idx
  FROM base)
SELECT doc_id, chunk_idx,
       len(toks[(chunk_idx * 24 + 1):(chunk_idx * 24 + 32)]) AS n_tokens,
       array_to_string(toks[(chunk_idx * 24 + 1):(chunk_idx * 24 + 32)], ' ') AS chunk_text
FROM idx
ORDER BY doc_id, chunk_idx
""",
)
def text_chunk_sliding_q(spark, sf_dir):
    """Sliding-window token chunking (32-token windows, stride 24 — 8-token
    overlap): the standard pretraining/RAG chunker as a map-only Catalyst
    pipeline; the oracle replays the identical tokenize→slice arithmetic."""
    from steampipe_sqlite_spark.functions.text import chunk_sliding

    docs = load_table(spark, sf_dir, "documents")
    return chunk_sliding(docs, "text", "doc_id", window=32, stride=24).orderBy(
        "doc_id", "chunk_idx"
    )


@query(
    "dataset_mixing_weights",
    oracle="""
SELECT source, COUNT(*) AS n_kept
FROM documents
WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
      < CASE source WHEN 'src0' THEN 80 WHEN 'src1' THEN 40 ELSE 10 END
GROUP BY source
ORDER BY source
""",
)
def dataset_mixing_weights(spark, sf_dir):
    """Per-source mixing weights (80/40/10%) with the same deterministic
    hash gate — how a pretraining mix is drawn reproducibly from weighted
    corpora."""
    docs = load_table(spark, sf_dir, "documents")
    gate = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    weight = (
        F.when(F.col("source") == "src0", 80)
        .when(F.col("source") == "src1", 40)
        .otherwise(10)
    )
    return (
        docs.filter(gate < weight)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("source")
    )


@query(
    "text_bigram_surprisal",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_DD_TOKS} AS ts FROM documents
),
bigrams AS (
  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
  FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
),
c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM bigrams GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS n1 FROM bigrams GROUP BY w1),
v AS (SELECT COUNT(DISTINCT w1) AS vocab FROM bigrams),
scored AS (
  SELECT b.doc_id,
         LN((c2.n2 + 1.0) / (c1.n1 + v.vocab)) AS logp
  FROM bigrams b
  JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
  JOIN c1 ON b.w1 = c1.w1
  CROSS JOIN v
)
SELECT doc_id, ROUND(-SUM(logp) / COUNT(*), 4) AS surprisal
FROM scored
GROUP BY doc_id
ORDER BY doc_id
""",
)
def text_bigram_surprisal(spark, sf_dir):
    """Corpus-trained bigram language model scoring each document's mean
    surprisal (-avg log Laplace-smoothed bigram probability) — the
    perplexity-filter primitive of pretraining-data curation.  All
    relational: one explode, two count aggregations, a broadcast-size
    model join back onto the bigrams.  At 100 TB the (w1,w2) count table
    is the 'model'; it would be written once and broadcast/bucket-joined."""
    from pyspark.sql import Window  # noqa: F401

    from steampipe_sqlite_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS w1, ts[i] AS w2))")
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    c2 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    vocab = bigrams.select("w1").distinct().count()
    scored = (
        bigrams.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), ["w1"])
        .select(
            "doc_id",
            F.log((F.col("n2") + 1.0) / (F.col("n1") + F.lit(float(vocab)))).alias("logp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(-F.sum("logp") / F.count(F.lit(1)), 4).alias("surprisal"))
        .orderBy("doc_id")
    )


# --- pandas-UDF group statistics (operators/groupstats.py) ----------------


@query(
    "group_zscore_pandas",
    oracle="""
SELECT event_id,
       ROUND((value - AVG(value) OVER (PARTITION BY event_type))
             / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 4) AS z
FROM events
ORDER BY event_id
LIMIT 2000
""",
)
def group_zscore_pandas_q(spark, sf_dir):
    """Per-group z-score via groupBy().applyInPandas (the §2.3
    applyInPandas surface), proven equal to the window-function SQL twin.
    4-dp rounding absorbs pandas-vs-SQL summation-order ULP noise.

    Scale note (measured, tools/python_memory_probe.py): applyInPandas
    materializes each GROUP as one pandas frame, and this op groups by
    low-cardinality event_type — corpus-sized groups at 100 TB.  It is
    kept as the API surface witness; the deployment path for this shape
    is the oracle's window-function twin (one exchange, no Python)."""
    from pyspark.sql import functions as F

    from steampipe_sqlite_spark.operators.groupstats import zscore_per_group

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return (
        zscore_per_group(ev, ["event_type"], "value", "z")
        .select("event_id", F.round("z", 4).alias("z"))
        .orderBy("event_id")
        .limit(2000)
    )


@query(
    "agg_gmean_pandas",
    oracle="""
SELECT event_type,
       ROUND(EXP(AVG(LN(value))) , 4) AS gmean_value
FROM events
WHERE value > 0
GROUP BY event_type
ORDER BY event_type
""",
)
def agg_gmean_pandas_q(spark, sf_dir):
    """Geometric mean as a grouped-aggregate pandas_udf, equal to the
    exp(avg(ln x)) relational twin."""
    from pyspark.sql import functions as F

    from steampipe_sqlite_spark.operators.groupstats import gmean_agg

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return (
        ev.groupBy("event_type")
        .agg(F.round(gmean_agg("value"), 4).alias("gmean_value"))
        .orderBy("event_type")
    )


@query(
    "pack_context_windows",
    plan_cache=False,  # bakes distributed-helper offsets; see registry.query
    oracle="""
WITH ordered AS (
  SELECT doc_id, n_chars,
         SUM(n_chars) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM documents
),
binned AS (
  SELECT doc_id, n_chars, cum,
         CAST((cum - n_chars) // 65536 AS BIGINT) AS bin
  FROM ordered
)
SELECT bin, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS packed_chars,
       CAST(SUM(CASE WHEN cum > (bin + 1) * 65536 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_straddle
FROM binned
GROUP BY bin
ORDER BY bin
""",
)
def pack_context_windows(spark, sf_dir):
    """Concatenated-stream context-window packing — the shape pretraining
    actually uses: documents are laid out in a deterministic shuffled
    order (md5 content key), the running length is cumulative-summed, and
    each document is assigned to the 64 KiB window where it STARTS
    (``n_straddle`` counts boundary-crossing docs, the ones a loader
    truncates or overflows).

    Scale shape: the global prefix sum runs through
    operators/scale.distributed_running_sum (range shuffle on the order
    key + per-partition local cumsum + driver-prefix-summed partition
    totals) — the earlier empty-OVER window spelling moved the whole
    corpus to one partition (VERDICT r6); this is exactly the
    "per-shard prefix offsets" plan the docstring used to defer to."""
    from steampipe_sqlite_spark.operators.scale import distributed_running_sum

    docs = load_table(spark, sf_dir, "documents")
    cum = distributed_running_sum(
        docs.select("doc_id", "n_chars"),
        "n_chars",
        [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")],
        name="cum",
    )
    binned = cum.selectExpr(
        "doc_id", "n_chars", "cum", "(cum - n_chars) div 65536 AS bin"
    )
    # orderBy: one row per 64 KiB context bin — cardinality scales with
    # total corpus chars, so the parallel range sort is the scale path.
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("packed_chars"),
            F.sum(
                F.expr("CASE WHEN cum > (bin + 1) * 65536 THEN 1 ELSE 0 END")
            ).cast("bigint").alias("n_straddle"),
        )
        .orderBy("bin")
    )


@query(
    "dedup_exact_substrings",
    oracle=f"""
WITH normed AS (SELECT doc_id AS id, {_DD_NORM} AS norm FROM documents),
g AS (
  SELECT id, i,
         CAST('0x' || substring(md5(substring(norm, CAST(i AS INT), 20)), 1, 15) AS BIGINT) AS h,
         LEAST(i + 19, length(norm)) AS gend
  FROM (SELECT id, norm, UNNEST(generate_series(1, GREATEST(length(norm) - 19, 1))) AS i
        FROM normed)
),
dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT id) >= 2),
dp AS (SELECT g.id, g.i, g.gend FROM g JOIN dup USING (h)),
m AS (
  SELECT id, i, gend,
         MAX(gend) OVER (PARTITION BY id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM dp
),
s AS (
  SELECT id, i, gend,
         SUM(CASE WHEN prev_end IS NULL OR i > prev_end + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
  FROM m
),
spans AS (SELECT id, span_id, MIN(i) AS st, MAX(gend) AS en FROM s GROUP BY id, span_id),
rolled AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
         CAST(SUM(en - st + 1) AS BIGINT) AS dup_chars
  FROM spans GROUP BY id
)
SELECT rolled.id AS doc_id, n_dup_spans, dup_chars,
       CAST(length(normed.norm) AS BIGINT) AS total_chars
FROM rolled JOIN normed ON rolled.id = normed.id
ORDER BY doc_id
""",
)
def dedup_exact_substrings_q(spark, sf_dir):
    """Exact-substring duplication audit (ExactSubstr of Lee et al. 2022,
    gram-approximated — suffix arrays don't distribute, gram-hash shuffles
    do): every character covered by a 20-char gram that also appears in
    another document is duplicated text; covered intervals merge into
    maximal spans.  Per-doc span count / duplicated chars / total chars,
    all integers (dup fraction = dup_chars/total_chars).  Catches the
    partial-copy overlap whole-document dedup misses, at span granularity
    rather than CDC's chunk granularity."""
    from steampipe_sqlite_spark.operators.dedup import duplicated_span_stats

    docs = load_table(spark, sf_dir, "documents")
    stats = duplicated_span_stats(docs, "text", "doc_id", k=20)
    # orderBy: one row per document with duplicated spans — unbounded.
    return stats.select(
        F.col("id").alias("doc_id"),
        "n_dup_spans",
        "dup_chars",
        "total_chars",
    ).orderBy("doc_id")


# BM25 ranked retrieval: one literal query against the corpus.  The idf is
# Robertson's (N - df + 0.5)/(df + 0.5) WITHOUT the usual log wrap: ln()
# may differ by 1 ulp between the JVM and libm, so the log-free form keeps
# every arithmetic step exact-rounded IEEE — bit-identical across engines
# (the hash-match then proves tf/dl/df/avgdl end to end).  This is a
# DOCUMENTED VARIANT, not rank-equivalent to log-idf BM25 in general:
# per-term the idf is monotone in df either way, but summing across terms
# weights rare terms more heavily than the log form does.  A deployment
# wanting textbook Okapi scores swaps ln() into _bm25_term_sql and accepts
# a tolerance-compare (or integer-log10 bucketing) instead of the exact
# hash gate.  k1=1.2, b=0.75.
_BM25_TERMS = ("spark", "join", "window")


def _bm25_term_sql(tf: str, df: str) -> str:
    # identical TEXTUAL structure on both engines => identical parse tree
    # => identical IEEE evaluation order
    # every literal carries e0: Spark types bare decimal literals as
    # DECIMAL and would compute the idf in truncated decimal arithmetic
    # (0.2929032 vs double 0.2929032258064516...); the e0 form is DOUBLE
    # in both engines
    return (
        f"((n - {df} + 0.5e0) / ({df} + 0.5e0)) * ({tf} * 2.2e0)"
        f" / ({tf} + 1.2e0 * (0.25e0 + 0.75e0 * dl / (CAST(sdl AS DOUBLE) / n)))"
    )


@query(
    "search_bm25_topk",
    oracle=f"""
WITH d AS (SELECT doc_id, string_split({_DD_NORM}, ' ') AS toks FROM documents),
t AS (
  SELECT doc_id, len(toks) AS dl,
         {", ".join(f"len(list_filter(toks, x -> x = '{w}')) AS tf{i+1}" for i, w in enumerate(_BM25_TERMS))}
  FROM d
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sdl,
         {", ".join(f"CAST(SUM(CASE WHEN tf{i+1} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i+1}" for i in range(len(_BM25_TERMS)))}
  FROM t
)
SELECT doc_id,
       CAST(ROUND(1000000e0 * ({" + ".join(_bm25_term_sql(f"tf{i+1}", f"df{i+1}") for i in range(len(_BM25_TERMS)))})) AS BIGINT) AS score_micro
FROM t CROSS JOIN stats
ORDER BY score_micro DESC, doc_id LIMIT 20
""",
)
def search_bm25_topk_q(spark, sf_dir):
    """BM25 top-20 for the literal query {terms}: per-doc tf/dl map-side,
    ONE 1-row corpus-stats aggregate (N, Σdl, per-term df) broadcast back,
    score = Σ idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), integer-micro
    output (see the ROUND contract in registry.py).  Scale shape: the
    stats row is metadata-sized whatever the corpus; the top-k is
    TakeOrderedAndProject (per-partition heap + driver merge of 20-row
    heads — no global sort)."""
    from steampipe_sqlite_spark.functions.text import _NORM_SQL

    docs = load_table(spark, sf_dir, "documents")
    t = docs.selectExpr(
        "doc_id",
        f"split({_NORM_SQL.format(c='text')}, ' ') AS toks",
    ).selectExpr(
        "doc_id",
        "size(toks) AS dl",
        *[
            f"size(filter(toks, x -> x = '{w}')) AS tf{i+1}"
            for i, w in enumerate(_BM25_TERMS)
        ],
    )
    stats = t.selectExpr(
        "CAST(COUNT(*) AS BIGINT) AS n",
        "CAST(SUM(dl) AS BIGINT) AS sdl",
        *[
            f"CAST(SUM(CASE WHEN tf{i+1} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i+1}"
            for i in range(len(_BM25_TERMS))
        ],
    )
    score = " + ".join(
        _bm25_term_sql(f"tf{i+1}", f"df{i+1}") for i in range(len(_BM25_TERMS))
    )
    return (
        t.crossJoin(F.broadcast(stats))
        .selectExpr(
            "doc_id",
            f"CAST(ROUND(1000000e0 * ({score})) AS BIGINT) AS score_micro",
        )
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(20)
    )


@query(
    "knn_cosine_filtered",
    oracle=f"""
SELECT query_id, neighbor_id, label, cosine, rank FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.label,
         {_DD_COS} AS cosine,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id
                            ORDER BY {_DD_COS} DESC, b.vec_id) AS rank
  FROM embeddings a JOIN embeddings b
    ON a.vec_id <> b.vec_id AND a.label = b.label
  WHERE a.vec_id < 10
) t
WHERE rank <= 5
ORDER BY query_id, rank
""",
)
def knn_filtered_q(spark, sf_dir):
    """Metadata-filtered exact top-5 (RAG-style constrained retrieval):
    neighbors must carry the query's label.  The label equality rides in
    the broadcast-join condition, so a selective filter shrinks the
    scored pair space instead of post-filtering it."""
    from steampipe_sqlite_spark.operators.similarity import filtered_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return presentation_sort(
        filtered_topk(emb, queries, "embedding", "vec_id", ["label"], k=5),
        ["query_id", "rank"],
    )


@query(
    "search_inverted_index",
    oracle=f"""
WITH tf AS (
  SELECT t.term, d.doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, string_split({_DD_NORM}, ' ') AS toks FROM documents) d,
       UNNEST(d.toks) AS t(term)
  GROUP BY t.term, d.doc_id
),
stats AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf
  FROM tf GROUP BY term HAVING COUNT(*) >= 5
),
ranked AS (
  SELECT term, doc_id,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM tf
),
postings AS (
  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS head_postings
  FROM ranked WHERE rn <= 20 GROUP BY term
)
SELECT stats.term, df, cf, head_postings
FROM stats JOIN postings ON stats.term = postings.term
ORDER BY stats.term
""",
)
def search_inverted_index_q(spark, sf_dir):
    """Inverted-index build: per term its document frequency, collection
    frequency, and the first 20 doc ids of the posting list (CSV string —
    arrays hash engine-differently, see agg_array_ops).  Scale shape: the
    posting-list head is a two-level slice — per (term, input-partition)
    first, then a per-term merge over <= 20 x P candidates — so no single
    reducer ever sees a stopword's FULL corpus-wide posting list; df/cf
    aggregate with map-side partial fold.  Both aggregates are term-keyed,
    so the join reuses the shuffle partitioning."""
    from steampipe_sqlite_spark.functions.text import _NORM_SQL

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.selectExpr(
            "doc_id", f"explode(split({_NORM_SQL.format(c='text')}, ' ')) AS term"
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    stats = (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
        .where("df >= 5")
    )
    # Two-level top-k for the posting-list head: a per-term ROW_NUMBER
    # window would funnel a stopword's ENTIRE posting list through one
    # reducer; instead each input partition contributes its own 20
    # smallest doc ids, and the final per-term merge sees <= 20 x P
    # candidate ids — the global smallest 20 are always among the
    # per-partition smallest 20.  (The level-1 collect_list state is
    # bounded by that term's rows within ONE input partition — not by 20;
    # the hard bound is per-partition, which is what kills the
    # single-reducer stopword funnel.)
    postings = (
        tf.withColumn("p", F.spark_partition_id())
        .groupBy("term", "p")
        .agg(
            F.expr("slice(sort_array(collect_list(doc_id)), 1, 20)").alias("head")
        )
        .groupBy("term")
        .agg(
            F.expr(
                "array_join(transform(slice(sort_array(flatten(collect_list(head))), 1, 20),"
                " x -> cast(x AS string)), ',')"
            ).alias("head_postings")
        )
    )
    # orderBy: one row per vocabulary term — grows with the corpus
    # (Heaps' law), so keep the parallel range sort.
    return stats.join(postings, "term").orderBy("term")


# Shared DuckDB prefix: near-dup components closure (same text as the
# dedup_components oracle).
_DD_COMPONENTS_CTE = """WITH RECURSIVE t AS (
  SELECT doc_id, lang, source,
         list_distinct([array_to_string(list_slice(toks, i, i+2), ' ')
           FOR i IN range(1, greatest(len(toks)-2, 1)+1)]) AS grams
  FROM (SELECT doc_id, lang, source, {toks} AS toks FROM documents)
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM t a JOIN t b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE ROUND(len(list_intersect(a.grams, b.grams)) * 1.0 /
              greatest(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)), 1),
              4) >= 0.3
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
walk(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, w.comp FROM walk w JOIN edges e ON e.u = w.node
),
comps AS (SELECT node AS doc_id, MIN(comp) AS component_id FROM walk GROUP BY node)"""


@query(
    "curation_keep_list",
    oracle=_DD_COMPONENTS_CTE.format(toks=_DD_TOKS) + f""",
quality AS (
  SELECT doc_id,
         ROUND((
           (CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0 ELSE 0.5 END)
           + (CASE WHEN length(text)*1.0/greatest(len({_DD_TOKS}),1) BETWEEN 3.0 AND 12.0
                   THEN 1.0 ELSE 0.5 END)
           + len(regexp_extract_all(text,'[A-Za-z]'))*1.0/greatest(length(text),1)
         ) / 3.0, 4) AS quality
  FROM documents
),
ranked AS (
  SELECT c.component_id, c.doc_id, q.quality,
         ROW_NUMBER() OVER (PARTITION BY c.component_id
                            ORDER BY q.quality DESC, c.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY c.component_id) AS component_size
  FROM comps c JOIN quality q ON c.doc_id = q.doc_id
)
SELECT component_id, doc_id AS keep_id, CAST(component_size AS BIGINT) AS component_size, quality AS keep_quality
FROM ranked WHERE rn = 1
ORDER BY component_id
""",
)
def curation_keep_list_q(spark, sf_dir):
    """The keep-one-per-cluster decision that closes the dedup loop:
    near-dup components (same closure as dedup_components) joined with the
    heuristic quality score, canonical doc = highest quality (doc_id
    tie-break).  Scale shape: components via hash-min label propagation,
    quality map-side, one component-keyed window for the argmax — the
    emitted keep-list is what a 100 TB curation pass feeds the writer."""
    from steampipe_sqlite_spark.functions.text import quality_score
    from steampipe_sqlite_spark.operators.dedup import ngram_jaccard_pairs
    from steampipe_sqlite_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", ["lang", "source"], n=3, threshold=0.3
    )
    comps = connected_components(
        pairs,
        src="id_a",
        dst="id_b",
        nodes=docs.select(F.col("doc_id").alias("node")),
    ).selectExpr("node AS doc_id", "component AS component_id")
    quality = docs.select("doc_id", quality_score(F.col("text")).alias("quality"))
    ranked = (
        comps.join(quality, "doc_id")
        .selectExpr(
            "component_id",
            "doc_id",
            "quality",
            "row_number() OVER (PARTITION BY component_id"
            " ORDER BY quality DESC, doc_id) AS rn",
            "count(1) OVER (PARTITION BY component_id) AS component_size",
        )
        .where("rn = 1")
    )
    # orderBy: one row per near-dup component — scales with the corpus.
    return ranked.selectExpr(
        "component_id",
        "doc_id AS keep_id",
        "CAST(component_size AS BIGINT) AS component_size",
        "quality AS keep_quality",
    ).orderBy("component_id")


@query(
    "dataset_split_leakage_safe",
    oracle=_DD_COMPONENTS_CTE.format(toks=_DD_TOKS) + """,
splits AS (
  SELECT doc_id, component_id,
         CASE
           WHEN CAST('0x' || substring(md5(CAST(component_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 80 THEN 'train'
           WHEN CAST('0x' || substring(md5(CAST(component_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90 THEN 'val'
           ELSE 'test'
         END AS split
  FROM comps
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT component_id) AS BIGINT) AS n_components
FROM splits
GROUP BY split
ORDER BY split
""",
)
def dataset_split_leakage_safe_q(spark, sf_dir):
    """Leakage-safe train/val/test split: the 80/10/10 gate hashes the
    near-dup COMPONENT id, not the document id, so two near-duplicate
    documents can never land in different splits (the eval-contamination
    failure mode of naive per-doc splitting).  Deterministic md5 gate —
    resumable and cluster-size independent; summary row per split."""
    from steampipe_sqlite_spark.operators.dedup import ngram_jaccard_pairs
    from steampipe_sqlite_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", ["lang", "source"], n=3, threshold=0.3
    )
    comps = connected_components(
        pairs,
        src="id_a",
        dst="id_b",
        nodes=docs.select(F.col("doc_id").alias("node")),
    ).selectExpr("node AS doc_id", "component AS component_id")
    gate = (
        "cast(conv(substring(md5(cast(component_id AS string)), 1, 15), 16, 10)"
        " as bigint) % 100"
    )
    splits = comps.selectExpr(
        "doc_id",
        "component_id",
        f"CASE WHEN {gate} < 80 THEN 'train'"
        f" WHEN {gate} < 90 THEN 'val' ELSE 'test' END AS split",
    )
    return presentation_sort(
        splits.groupBy("split").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("component_id").cast("long").alias("n_components"),
        ),
        ["split"],
    )


@query(
    "dataset_temperature_weights",
    oracle="""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(ROUND(1000000e0 * SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w
  FROM documents GROUP BY source
),
total AS (SELECT CAST(SUM(w) AS BIGINT) AS sw FROM counts)
SELECT source, n_docs,
       CAST(ROUND(1000000e0 * (CAST(w AS DOUBLE) / sw)) AS BIGINT) AS weight_micro
FROM counts CROSS JOIN total
ORDER BY source
""",
)
def dataset_temperature_weights_q(spark, sf_dir):
    """Temperature-based source mixing (the multilingual-pretraining
    p_s ∝ n_s^α rebalance, α=0.5): upsamples small sources relative to
    proportional sampling.  sqrt is IEEE correctly-rounded in both
    engines, so the weights hash-match without tolerance (α≠0.5 would
    ride pow(), which may differ by 1 ulp between JVM and libm).  One
    source-keyed aggregate + a 1-row broadcast total — metadata-sized at
    any corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    ).selectExpr(
        "source",
        "n_docs",
        # integer-micro per-source weight BEFORE the sum: a float SUM's
        # fold order varies with partitioning, so sw would be 1-ulp
        # nondeterministic; the integer sum is exact and order-free
        "CAST(ROUND(1000000e0 * SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w",
    )
    total = counts.agg(F.sum("w").cast("long").alias("sw"))
    return presentation_sort(
        counts.crossJoin(F.broadcast(total)).selectExpr(
            "source",
            "n_docs",
            "CAST(ROUND(1000000e0 * (CAST(w AS DOUBLE) / sw)) AS BIGINT) AS weight_micro",
        ),
        ["source"],
    )


def _pagerank_iter_sql(prev: str, out: str) -> str:
    # one integer-nano PageRank round (shared recurrence with
    # operators/graph.pagerank_nano — see its docstring)
    return f"""
c{out} AS (
  SELECT e.dst AS node, CAST(SUM(r.rank_nano // o.outdeg) AS BIGINT) AS in_sum
  FROM edges e JOIN r{prev} r ON e.src = r.node
  JOIN outdeg o ON e.src = o.node
  GROUP BY e.dst
),
r{out} AS (
  SELECT nodes.node,
         CAST((150000000 // (SELECT n FROM nn)) + (85 * COALESCE(c{out}.in_sum, 0)) // 100 AS BIGINT) AS rank_nano
  FROM nodes LEFT JOIN c{out} ON nodes.node = c{out}.node
)"""


@query(
    "graph_pagerank",
    oracle=(
        """
WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
nodes AS (SELECT doc_id AS node FROM documents),
edges AS (
  SELECT node AS src, (node * 31 + 7) % (SELECT n FROM nn) AS dst FROM nodes
  UNION ALL
  SELECT node AS src, (node * 17 + 3) % (SELECT n FROM nn) AS dst FROM nodes
),
outdeg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1000000000 // (SELECT n FROM nn) AS BIGINT) AS rank_nano FROM nodes),"""
        + ",".join(_pagerank_iter_sql(i, i + 1) for i in range(3))
        + """
SELECT node AS doc_id, rank_nano FROM r3 ORDER BY doc_id
"""
    ),
)
def graph_pagerank_q(spark, sf_dir):
    """Distributed PageRank (3 rounds, damping 0.85) over a deterministic
    functional graph on documents (two out-edges per node: id*31+7 and
    id*17+3 mod N) — the iterative-join/aggregate Pregel shape beyond
    label propagation.  Integer nano-unit arithmetic end to end, so the
    DuckDB oracle (rounds unrolled as CTEs) matches bit-for-bit: the hash
    proves the distributed iteration itself."""
    from steampipe_sqlite_spark.operators.graph import pagerank_nano

    docs = load_table(spark, sf_dir, "documents")
    nodes = docs.select(F.col("doc_id").alias("node"))
    n = nodes.count()
    edges = docs.selectExpr(
        f"doc_id AS src", f"(doc_id * 31 + 7) % {n} AS dst"
    ).unionAll(
        docs.selectExpr(f"doc_id AS src", f"(doc_id * 17 + 3) % {n} AS dst")
    )
    ranks = pagerank_nano(edges, nodes, iters=3, damping_pct=85)
    # orderBy: one row per graph node — unbounded.
    return ranks.selectExpr("node AS doc_id", "rank_nano").orderBy("doc_id")


# --- Round-5 additions: dictionary tagging, containment dedup, cross-source
# contamination, mixing schedule, hybrid retrieval ---------------------------

# Spark-dialect twin of _DD_NORM (Java regex spelling; same normalization as
# functions/text._NORM_SQL, inlined here for pure-SQL corpus entries).
_SP_NORM = (
    r"trim(regexp_replace(regexp_replace(lower(text),"
    r"'[^a-z0-9\u4e00-\u9fff ]', ' '), '\\s+', ' '))"
)

sql_query(
    "text_keyword_tag",
    f"""
WITH toks AS (
  SELECT doc_id, explode(split({_SP_NORM}, ' ')) AS tok FROM documents
),
kw AS (SELECT keyword FROM VALUES ('join'), ('hash'), ('vector'), ('data'), ('scan') AS t(keyword))
SELECT doc_id, keyword, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM toks JOIN kw ON tok = keyword
GROUP BY doc_id, keyword
ORDER BY doc_id, keyword
""",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_DD_NORM}, ' ')) AS tok FROM documents
),
kw AS (SELECT keyword FROM (VALUES ('join'), ('hash'), ('vector'), ('data'), ('scan')) t(keyword))
SELECT doc_id, keyword, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM toks JOIN kw ON tok = keyword
GROUP BY doc_id, keyword
ORDER BY doc_id, keyword
""",
)
# ^ FlashText-style dictionary tagging: the keyword list is a 5-row inline
# VALUES relation, so Catalyst auto-broadcasts it against the exploded token
# stream (map-side hash join, no shuffle of the corpus); the per-(doc,
# keyword) count is a partial-agg-folded groupBy.  Output scales with the
# corpus -> trailing ORDER BY stays a parallel range sort.


sql_query(
    "dedup_containment_ngram",
    f"""
WITH t AS (SELECT doc_id, split({_SP_NORM}, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id, explode(array_distinct(transform(
           sequence(1, greatest(size(toks) - 4, 1)),
           i -> array_join(slice(toks, i, 5), ' ')))) AS gram
  FROM t
),
shared AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) BETWEEN 2 AND 100),
gated AS (SELECT g.doc_id, g.gram FROM g JOIN shared s ON g.gram = s.gram),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM gated a JOIN gated b ON a.gram = b.gram AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM g GROUP BY doc_id)
SELECT id_a, id_b, n_common, s.n_grams AS n_a
FROM common JOIN sizes s ON common.id_a = s.doc_id
WHERE 100 * n_common >= 80 * s.n_grams
ORDER BY id_a, id_b
""",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split({_DD_NORM}, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(toks) - 4, 1)),
           i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS gram
  FROM t
),
shared AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) BETWEEN 2 AND 100),
gated AS (SELECT g.doc_id, g.gram FROM g JOIN shared s ON g.gram = s.gram),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM gated a JOIN gated b ON a.gram = b.gram AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM g GROUP BY doc_id)
SELECT id_a, id_b, n_common, s.n_grams AS n_a
FROM common JOIN sizes s ON common.id_a = s.doc_id
WHERE 100 * n_common >= 80 * s.n_grams
ORDER BY id_a, id_b
""",
)
# ^ Broder-style CONTAINMENT near-dup (directed: >=80% of A's distinct
# 5-token shingles appear in B) — catches subset/partial-copy duplication
# that symmetric Jaccard misses.  Scale shape: candidates meet on gram
# equi-join keys, never an O(n^2) pair space; the `shared` gate (2..100
# docs per gram) is applied to EACH side BEFORE the self-join (the
# `gated` CTE — structural, not optimizer-dependent: Spark's left-deep
# default would otherwise blow up a boilerplate gram before filtering),
# dropping unique grams (no pair) and boilerplate grams (>100 docs) and
# bounding per-gram fan-out at C(100,2); the integer-only
# threshold (100*n_common >= 80*n_a) avoids cross-engine float division.
# Containment is measured over gated grams (a documented lower bound);
# the denominator n_a is the doc's full distinct-gram count.


sql_query(
    "contamination_source_matrix",
    f"""
WITH t AS (SELECT source, split({_SP_NORM}, ' ') AS toks FROM documents),
g AS (
  SELECT DISTINCT source, gram FROM (
    SELECT source, explode(transform(
             sequence(1, greatest(size(toks) - 12, 1)),
             i -> array_join(slice(toks, i, 13), ' '))) AS gram
    FROM t
  ) x
)
SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY src_a, src_b
""",
    oracle=f"""
WITH t AS (SELECT source, string_split({_DD_NORM}, ' ') AS toks FROM documents),
g AS (
  SELECT DISTINCT source, gram FROM (
    SELECT source, unnest(list_transform(
             generate_series(1, greatest(len(toks) - 12, 1)),
             i -> array_to_string(list_slice(toks, i, i + 12), ' '))) AS gram
    FROM t
  ) x
)
SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY src_a, src_b
""",
    present_sort=["src_a", "src_b"],
)
# ^ Train/test decontamination at SOURCE granularity: the 13-token-gram
# (the standard decontamination shingle width) overlap matrix between every
# source pair.  DISTINCT (source, gram) first bounds the join input at one
# row per gram per source; pairs meet on the gram key; output is bounded at
# C(|sources|, 2) — a reduced final, so presentation_sort applies.


sql_query(
    "dataset_epochs_schedule",
    f"""
WITH counts AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(size(split({_SP_NORM}, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n_docs, n_tokens,
         CAST(ROUND(1000000e0 * SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS wm
  FROM counts
),
tot AS (SELECT CAST(SUM(wm) AS BIGINT) AS sw FROM w)
SELECT source, n_docs, n_tokens,
       CAST(ROUND(1000000e0 * (CAST(wm AS DOUBLE) / sw)) AS BIGINT) AS weight_micro,
       CAST(ROUND(1000e0 * ((1000000e0 * (CAST(wm AS DOUBLE) / sw)) / CAST(n_tokens AS DOUBLE))) AS BIGINT) AS epochs_milli
FROM w CROSS JOIN tot
ORDER BY source
""",
    oracle=f"""
WITH counts AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split({_DD_NORM}, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n_docs, n_tokens,
         CAST(ROUND(1000000e0 * SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS wm
  FROM counts
),
tot AS (SELECT CAST(SUM(wm) AS BIGINT) AS sw FROM w)
SELECT source, n_docs, n_tokens,
       CAST(ROUND(1000000e0 * (CAST(wm AS DOUBLE) / sw)) AS BIGINT) AS weight_micro,
       CAST(ROUND(1000e0 * ((1000000e0 * (CAST(wm AS DOUBLE) / sw)) / CAST(n_tokens AS DOUBLE))) AS BIGINT) AS epochs_milli
FROM w CROSS JOIN tot
ORDER BY source
""",
    present_sort=["source"],
)
# ^ Data-mixing schedule: temperature-weighted (alpha=0.5 via SQRT — the
# algebraic form, never pow(); registry numeric rules) token share of a
# 1M-token budget per source, expressed as epochs over each source's own
# token count (epochs > 1000 milli = the source repeats).  The cross join
# broadcasts a 1-row total; per-source weights are integer micros BEFORE
# any division so the shares are fold-order-free.


_RRF_K = 60  # standard reciprocal-rank-fusion constant


def _rrf_leg_sql(bm_src: str, cos_src: str) -> str:
    """Shared fusion tail: full-outer join of the two top-100 rank lists,
    missing-list contribution 0.  Identical text both engines."""
    return f"""
SELECT COALESCE(bm.doc_id, cs.doc_id) AS doc_id,
       CAST(COALESCE(bm.r_b, 0) AS BIGINT) AS rank_bm25,
       CAST(COALESCE(cs.r_c, 0) AS BIGINT) AS rank_cos,
       COALESCE(1e0 / ({_RRF_K}e0 + bm.r_b), 0e0)
         + COALESCE(1e0 / ({_RRF_K}e0 + cs.r_c), 0e0) AS rrf_score
FROM {bm_src} bm FULL OUTER JOIN {cos_src} cs ON bm.doc_id = cs.doc_id
ORDER BY rrf_score DESC, doc_id
LIMIT 20
"""


@query(
    "search_hybrid_rrf",
    oracle=f"""
WITH d AS (SELECT doc_id, string_split({_DD_NORM}, ' ') AS toks FROM documents),
t AS (
  SELECT doc_id, len(toks) AS dl,
         {", ".join(f"len(list_filter(toks, x -> x = '{w}')) AS tf{i+1}" for i, w in enumerate(_BM25_TERMS))}
  FROM d
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sdl,
         {", ".join(f"CAST(SUM(CASE WHEN tf{i+1} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i+1}" for i in range(len(_BM25_TERMS)))}
  FROM t
),
bm_top AS (
  SELECT doc_id,
         CAST(ROUND(1000000e0 * ({" + ".join(_bm25_term_sql(f"tf{i+1}", f"df{i+1}") for i in range(len(_BM25_TERMS)))})) AS BIGINT) AS score_micro
  FROM t CROSS JOIN stats
  ORDER BY score_micro DESC, doc_id LIMIT 100
),
bm AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS r_b FROM bm_top),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
cos_top AS (
  SELECT c.vec_id AS doc_id,
         ROUND(list_inner_product(CAST(c.embedding AS DOUBLE[]), qv) /
               (SQRT(list_inner_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))
                * SQRT(list_inner_product(qv, qv))), 4) AS cosine
  FROM embeddings c CROSS JOIN q
  ORDER BY cosine DESC, doc_id LIMIT 100
),
cs AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS r_c FROM cos_top)
{_rrf_leg_sql("bm", "cs")}
""",
)
def search_hybrid_rrf_q(spark, sf_dir):
    """Hybrid retrieval: BM25 top-100 and cosine top-100 (query = vec 0's
    embedding) fused by reciprocal-rank fusion (1/(60+rank), the standard
    RRF constant), top-20 out.  Scale shape: BOTH legs end in
    TakeOrderedAndProject (per-partition heap, no global sort/window over
    the corpus); ranks are assigned by a window over the 100-row retrieved
    lists only — fusion over retrieved lists IS the production RRF
    semantics, and it keeps every unbounded stage rank-free.  The fused
    doubles are sums of exact divisions of small ints — bit-identical
    cross-engine; ties (rank swaps) break on doc_id."""
    from steampipe_sqlite_spark.functions.text import _NORM_SQL
    from steampipe_sqlite_spark.functions.vectors import dot_sql

    register_views(spark, sf_dir, ("documents", "embeddings"))
    toks = f"split({_NORM_SQL.format(c='text')}, ' ')"
    tf_cols = ", ".join(
        f"size(filter(toks, x -> x = '{w}')) AS tf{i+1}"
        for i, w in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf{i+1} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i+1}"
        for i in range(len(_BM25_TERMS))
    )
    score = " + ".join(
        _bm25_term_sql(f"tf{i+1}", f"df{i+1}") for i in range(len(_BM25_TERMS))
    )
    cos = (
        f"round({dot_sql('c.embedding', 'qv')}"
        f" / (sqrt({dot_sql('c.embedding', 'c.embedding')})"
        f" * sqrt({dot_sql('qv', 'qv')})), 4)"
    )
    return spark.sql(f"""
WITH d AS (SELECT doc_id, {toks} AS toks FROM documents),
t AS (SELECT doc_id, size(toks) AS dl, {tf_cols} FROM d),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sdl, {df_cols}
  FROM t
),
bm_top AS (
  SELECT doc_id,
         CAST(ROUND(1000000e0 * ({score})) AS BIGINT) AS score_micro
  FROM t CROSS JOIN stats
  ORDER BY score_micro DESC, doc_id LIMIT 100
),
bm AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS r_b FROM bm_top),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cos_top AS (
  SELECT c.vec_id AS doc_id, {cos} AS cosine
  FROM embeddings c CROSS JOIN q
  ORDER BY cosine DESC, doc_id LIMIT 100
),
cs AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS r_c FROM cos_top)
{_rrf_leg_sql("bm", "cs")}
""")


def _dd_pq_ctes(m: int = 4, cb: int = 16, d_sub: int = 16, nq: int = 10) -> str:
    """DuckDB CTE chain replaying similarity.pq_codebooks + pq_topk's
    encode/LUT/ADC with the 2 Lloyd iterations UNROLLED — the kmeans
    oracle pattern (_dd_kmeans_ctes) generalized to subspace keys.  The
    array lookup of the Spark ADC (zip_with over per-query LUT arrays)
    replays as a relational join on (m, cell); the nano-int partials make
    the SUM fold-order-free, so GROUP BY order cannot flip the hash."""
    subs = ", ".join(str(j) for j in range(m))

    def d2(s: str, c: str) -> str:
        return f"ROUND({s}.svv - 2 * list_inner_product({s}.sv, {c}.cv) + {c}.cc, 4)"

    def assign(name: str, cent: str) -> str:
        return f"""{name} AS (
  SELECT id, m, sv, svv, cell FROM (
    SELECT s.id, s.m, s.sv, s.svv, c.cid AS cell,
           ROW_NUMBER() OVER (PARTITION BY s.id, s.m
                              ORDER BY {d2('s', 'c')}, c.cid) AS r
    FROM sub2 s JOIN {cent} c ON s.m = c.m) t
  WHERE r = 1
)"""

    def update(name: str, prev: str) -> str:
        return f"""{name} AS (
  SELECT m, cell AS cid, LIST(avg_val ORDER BY pos) AS cv,
         list_inner_product(LIST(avg_val ORDER BY pos), LIST(avg_val ORDER BY pos)) AS cc
  FROM (
    SELECT a.m, a.cell, i - 1 AS pos,
           CAST(SUM(CAST(ROUND(a.sv[i] * 1000000000.0) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 1000000000.0 AS avg_val
    FROM {prev} a, UNNEST(GENERATE_SERIES(1, {d_sub})) AS t(i)
    GROUP BY a.m, a.cell, i) s
  GROUP BY m, cell
)"""

    return f"""WITH v AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS vv
  FROM embeddings
),
sub2 AS (
  SELECT id, m, sv, list_inner_product(sv, sv) AS svv FROM (
    SELECT id, t.m AS m, list_slice(v, t.m * {d_sub} + 1, t.m * {d_sub} + {d_sub}) AS sv
    FROM v, UNNEST([{subs}]) AS t(m)) x
),
c0 AS (SELECT m, id AS cid, sv AS cv, svv AS cc FROM sub2 WHERE id < {cb}),
{assign("a0", "c0")},
{update("c1", "a0")},
{assign("a1", "c1")},
{update("c2", "a1")},
c2d AS (
  SELECT m, ROW_NUMBER() OVER (PARTITION BY m ORDER BY cid) - 1 AS cid, cv, cc
  FROM c2
),
{assign("codes", "c2d")},
qn AS (SELECT id AS qid, SQRT(vv) AS qn FROM v WHERE id < {nq}),
lut AS (
  SELECT s.id AS qid, c.m, c.cid,
         CAST(ROUND(1000000000.0 * list_inner_product(s.sv, c.cv)) AS BIGINT) AS partial
  FROM sub2 s JOIN c2d c ON s.m = c.m
  WHERE s.id < {nq}
),
scored AS (
  SELECT q.qid AS query_id, x.id AS neighbor_id,
         ROUND((CAST(SUM(l.partial) AS DOUBLE) / 1000000000.0)
               / (q.qn * SQRT(vx.vv)), 4) AS approx_cos
  FROM codes x
  JOIN lut l ON l.m = x.m AND l.cid = x.cell
  JOIN qn q ON q.qid = l.qid
  JOIN v vx ON vx.id = x.id
  WHERE q.qid <> x.id
  GROUP BY q.qid, x.id, q.qn, vx.vv
)"""


# Shared by knn_cosine_pq (direct pq_topk_rerank) and
# knn_ivfpq_index_persisted (build-then-query through the on-disk IVF-PQ
# index at nprobe = n_cells): a full probe makes the ADC candidate set the
# whole corpus, so index-then-query equals the direct PQ pipeline exactly
# (pinned by tests/test_llm_ops.py::TestIvfPqIndexPersistence::
# test_full_probe_equals_direct_pq_rerank) and one oracle covers both.
_PQ_RERANK_ORACLE = f"""
{_dd_pq_ctes()},
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY approx_cos DESC, neighbor_id) AS r
    FROM scored) t
  WHERE r <= 50
),
exact AS (
  SELECT s.query_id, s.neighbor_id,
         ROUND(list_inner_product(qv.v, nv.v) / (SQRT(qv.vv) * SQRT(nv.vv)), 4) AS cosine
  FROM short s
  JOIN v qv ON qv.id = s.query_id
  JOIN v nv ON nv.id = s.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM exact) t
WHERE rank <= 5
ORDER BY query_id, rank
"""


@query("knn_cosine_pq", oracle=_PQ_RERANK_ORACLE)
def knn_cosine_pq_q(spark, sf_dir):
    """Product-quantization ANN (Jégou et al. 2011 construction), the full
    serving pipeline: per-subspace codebooks (4×16, generalized Lloyd, 2
    fixed rounds), corpus encoded as 4 codeword ids + 1 exact norm,
    per-query ADC lookup tables (integer-nano partials), shortlist-50 by
    approximate cosine, exact re-rank to top-5.  The ENTIRE pipeline —
    training, encoding, LUT build, ADC scan, re-rank — is replayed by the
    unrolled-CTE oracle, so the iterative fit and the two-stage retrieval
    are both hash-checked.  Compression here is 4×4-bit codes vs 64
    floats; at 100 TB the ADC scan reads ~64× less than a raw-vector
    scan and the exact stage touches only Q×50 vectors."""
    from steampipe_sqlite_spark.operators.similarity import pq_topk_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return presentation_sort(
        pq_topk_rerank(emb, queries, "embedding", "vec_id", k=5, shortlist=50),
        ["query_id", "rank"],
    )


@query("knn_ivfpq_index_persisted", oracle=_PQ_RERANK_ORACLE)
def knn_ivfpq_index_persisted_q(spark, sf_dir):
    """Persisted-IVF-PQ serving lifecycle as a driver-checkable witness
    (VERDICT r11 #5): build the FAISS-style on-disk layout (coarse
    centroids + PQ codebooks + cells hive-partitioned BY CELL carrying
    (id, codes, nrm, v)), then answer top-5 THROUGH it — partition-pruned
    probe, column-pruned ADC pass over (id, codes, nrm), shortlist-50,
    exact refine.  nprobe = n_cells (8) makes the ADC candidate set the
    whole corpus, so the direct PQ pipeline's oracle replays the result
    value-for-value while the index build/read-back/two-axis-pruning
    machinery is what's newly under driver test; partial-probe recall is
    covered by pytest (TestIvfPqIndexPersistence.test_partial_probe_recall)."""
    from steampipe_sqlite_spark.operators.similarity import (
        ivfpq_build_index,
        ivfpq_query_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = _ensure_index(
        sf_dir, "ivfpq8",
        lambda p: ivfpq_build_index(emb, "embedding", "vec_id", p, n_cells=8),
        parts=("centroids", "codebooks", "cells"),
    )
    queries = emb.filter(F.col("vec_id") < 10)
    return presentation_sort(
        ivfpq_query_index(
            spark, path, queries, "embedding", "vec_id", k=5, nprobe=8,
            shortlist=50,
        ),
        ["query_id", "rank"],
    )


# --- Data-quality / observability ops (round 5) -----------------------------

sql_query(
    "quality_constraints_audit",
    """
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(text) AS BIGINT) AS n_text,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_ids,
         CAST(SUM(CASE WHEN n_chars BETWEEN 1 AND 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_range,
         CAST(SUM(CASE WHEN lang IN ('en', 'de', 'fr', 'es', 'zh') THEN 1 ELSE 0 END) AS BIGINT) AS n_lang
  FROM documents
)
SELECT c.name AS constraint_name,
       CAST(ROUND(1000000e0 * c.num / n_rows) AS BIGINT) AS metric_micro,
       c.num = n_rows AS passed
FROM m
LATERAL VIEW explode(array(
  named_struct('name', 'completeness_text', 'num', n_text),
  named_struct('name', 'uniqueness_doc_id', 'num', n_ids),
  named_struct('name', 'range_n_chars', 'num', n_range),
  named_struct('name', 'allowed_lang', 'num', n_lang)
)) t AS c
ORDER BY constraint_name
""",
    oracle="""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(text) AS BIGINT) AS n_text,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_ids,
         CAST(SUM(CASE WHEN n_chars BETWEEN 1 AND 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_range,
         CAST(SUM(CASE WHEN lang IN ('en', 'de', 'fr', 'es', 'zh') THEN 1 ELSE 0 END) AS BIGINT) AS n_lang
  FROM documents
)
SELECT c.name AS constraint_name,
       CAST(ROUND(1000000e0 * c.num / n_rows) AS BIGINT) AS metric_micro,
       c.num = n_rows AS passed
FROM m, UNNEST([
  struct_pack(name := 'completeness_text', num := n_text),
  struct_pack(name := 'uniqueness_doc_id', num := n_ids),
  struct_pack(name := 'range_n_chars', num := n_range),
  struct_pack(name := 'allowed_lang', num := n_lang)
]) AS t(c)
ORDER BY constraint_name
""",
    present_sort=["constraint_name"],
)
# ^ Deequ-style declarative constraint audit in ONE aggregation pass:
# completeness, key uniqueness, range, and domain membership all fold in a
# single scan (one shuffle of one partial-agg row per partition), then
# explode to the long (constraint, metric, passed) report.  At 100 TB this
# is the shape a data-quality gate actually runs — N constraints must
# never mean N scans.


sql_query(
    "dataset_drift_tvd",
    """
WITH binned AS (
  SELECT LEAST(CAST(FLOOR(n_chars / 200e0) AS BIGINT), 9) AS bin,
         CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS in_a
  FROM documents
),
counts AS (
  SELECT bin,
         CAST(SUM(in_a) AS BIGINT) AS n_a,
         CAST(SUM(1 - in_a) AS BIGINT) AS n_b
  FROM binned GROUP BY bin
),
tot AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta, CAST(SUM(n_b) AS BIGINT) AS tb FROM counts)
SELECT bin, n_a, n_b,
       CAST(ROUND(1000000e0 * n_a / ta) AS BIGINT) AS pa_micro,
       CAST(ROUND(1000000e0 * n_b / tb) AS BIGINT) AS pb_micro,
       ABS(CAST(ROUND(1000000e0 * n_a / ta) AS BIGINT)
           - CAST(ROUND(1000000e0 * n_b / tb) AS BIGINT)) AS delta_abs_micro
FROM counts CROSS JOIN tot
ORDER BY bin
""",
    present_sort=["bin"],
)
# ^ Snapshot drift detection: the doc_id-parity halves stand in for two
# crawl snapshots; n_chars is binned by FIXED integer width (div 200, cap
# bin 9 — deterministic, no quantile estimation), per-bin proportions are
# integer micros, and the per-bin |Δ| column sums to 2×the total-variation
# distance.  No ln()/PSI on purpose: TVD needs only +,-,abs on exact
# integers, so the drift report is bit-identical everywhere (registry
# numeric rules).  Scale shape: one scan, one 10-row aggregate, one 1-row
# broadcast total.


def _dd_mmr_ctes(nq: int = 5, pool: int = 10, k: int = 5) -> str:
    """DuckDB replay of similarity.mmr_select: candidate pool, pairwise
    4-dp sims, and the greedy argmax loop UNROLLED one CTE pair per step
    (the kmeans/pagerank fixed-iteration oracle pattern applied to a
    sequential selection).  λ=0.5 is dyadic (0.5·x is IEEE-exact) and
    rel/sim are pre-rounded, so every step's scores are bit-identical to
    the pandas greedy loop."""
    cos_ab = _DD_COS
    cos_pair = _DD_COS.replace("a.embedding", "ea.embedding").replace(
        "b.embedding", "eb.embedding"
    )
    parts = [f"""cand AS (
  SELECT query_id, cid, rel FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS cid, {cos_ab} AS rel,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                              ORDER BY {cos_ab} DESC, b.vec_id) AS r
    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    WHERE a.vec_id < {nq}
  ) t WHERE r <= {pool}
)""",
        f"""psim AS (
  SELECT x.query_id, x.cid AS ia, y.cid AS ib, {cos_pair} AS sim
  FROM cand x
  JOIN cand y ON x.query_id = y.query_id AND x.cid <> y.cid
  JOIN embeddings ea ON ea.vec_id = x.cid
  JOIN embeddings eb ON eb.vec_id = y.cid
)""",
        """s1 AS (
  SELECT query_id, cid AS id, 0.5e0 * rel AS score FROM (
    SELECT query_id, cid, rel,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY 0.5e0 * rel DESC, cid) AS r
    FROM cand) t
  WHERE r = 1
)""",
        "sel1 AS (SELECT query_id, id FROM s1)",
    ]
    for n in range(2, k + 1):
        parts.append(f"""p{n} AS (
  SELECT c.query_id, c.cid AS id, 0.5e0 * c.rel - 0.5e0 * MAX(p.sim) AS score
  FROM cand c
  JOIN psim p ON p.query_id = c.query_id AND p.ia = c.cid
  JOIN sel{n-1} w ON w.query_id = p.query_id AND w.id = p.ib
  WHERE NOT EXISTS (SELECT 1 FROM sel{n-1} z
                    WHERE z.query_id = c.query_id AND z.id = c.cid)
  GROUP BY c.query_id, c.cid, c.rel
)""")
        parts.append(f"""s{n} AS (
  SELECT query_id, id, score FROM (
    SELECT query_id, id, score,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, id) AS r
    FROM p{n}) t
  WHERE r = 1
)""")
        parts.append(
            f"sel{n} AS (SELECT * FROM sel{n-1} UNION ALL SELECT query_id, id FROM s{n})"
        )
    final = "\nUNION ALL\n".join(
        f"SELECT query_id, {n} AS step, id AS doc_id, score AS mmr_score FROM s{n}"
        for n in range(1, k + 1)
    )
    return "WITH " + ",\n".join(parts) + f"\nSELECT * FROM (\n{final}\n) u"


@query(
    "search_mmr_diversified",
    oracle=f"""
SELECT query_id, step, doc_id, mmr_score FROM (
{_dd_mmr_ctes()}
) z
ORDER BY query_id, step
""",
)
def search_mmr_diversified_q(spark, sf_dir):
    """MMR diversified top-5 (λ=0.5) from each query's exact top-10
    candidate pool — relevance traded against redundancy, the standard
    search/RAG result-diversification operator.  The greedy argmax loop
    runs in applyInPandas over the pool² pair grid per query (bounded,
    never the corpus); the oracle unrolls all 5 selection steps as CTE
    pairs, so the sequential algorithm is hash-checked end to end."""
    from steampipe_sqlite_spark.operators.similarity import mmr_select

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return presentation_sort(
        mmr_select(emb, queries, "embedding", "vec_id", k=5, pool=10),
        ["query_id", "step"],
    )


sql_query(
    "text_oov_rate",
    f"""
WITH toks AS (
  SELECT doc_id, explode(split({_SP_NORM}, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
    ORDER BY c DESC, tok LIMIT 100
  ) v
),
flagged AS (
  SELECT t.doc_id,
         CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       CAST(ROUND(1000000e0 * SUM(oov) / COUNT(*)) AS BIGINT) AS oov_micro
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
""",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_DD_NORM}, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
    ORDER BY c DESC, tok LIMIT 100
  ) v
),
flagged AS (
  SELECT t.doc_id,
         CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       CAST(ROUND(1000000e0 * SUM(oov) / COUNT(*)) AS BIGINT) AS oov_micro
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
""",
)
# ^ Tokenizer-coverage analysis: vocabulary = the corpus's top-100 tokens
# (TakeOrderedAndProject — bounded, broadcastable), each document scored by
# its out-of-vocabulary token fraction (integer micros).  The vocab rides a
# broadcast LEFT join against the exploded token stream — no shuffle of the
# corpus beyond the per-doc count; at 100 TB the vocab stays a top-N
# constant and the scan stays map-side.


def _dd_jl_oracle(n_dims_out: int = 4) -> str:
    """DuckDB twin of similarity.random_projection for the first
    ``n_dims_out`` output dims: same seeded planes inlined as literals,
    same sequential dot fold (list_inner_product vs the left-to-right
    aggregate fold — identical summation order), same 1/sqrt(16) scale."""
    import math

    from steampipe_sqlite_spark.operators.similarity import hyperplanes

    planes = hyperplanes(64, 16, seed=7)
    scale = 1.0 / math.sqrt(16)
    cols = ",\n       ".join(
        "ROUND(list_inner_product(CAST(embedding AS DOUBLE[]), ["
        + ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in planes[i])
        + f"]) * CAST({scale!r} AS DOUBLE), 4) AS p{i}"
        for i in range(n_dims_out)
    )
    return f"""
SELECT vec_id,
       {cols}
FROM embeddings
ORDER BY vec_id
"""


@query("emb_random_projection", oracle=_dd_jl_oracle())
def emb_random_projection_q(spark, sf_dir):
    """Johnson–Lindenstrauss 64→16 random projection (seeded Gaussian
    planes shipped as expression literals, 1/sqrt(16) scale) — the
    dimensionality reduction that fronts clustering/ANN at corpus scale;
    measured distance-ratio mean 0.93 ± 0.17 on the fixture.  The query
    emits the first 4 projected dims (4-dp rounded; arrays never cross
    the driver hash), and the oracle inlines the identical plane
    literals with the identical sequential dot fold."""
    from steampipe_sqlite_spark.operators.similarity import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    proj = random_projection(emb, "embedding", "vec_id", in_dim=64, out_dim=16, seed=7)
    return proj.selectExpr(
        "id AS vec_id",
        *[f"round(proj[{i}], 4) AS p{i}" for i in range(4)],
    ).orderBy("vec_id")


@query(
    "dedup_ppjoin_exact",
    oracle=f"""
WITH sp AS (SELECT doc_id AS id, string_split({_DD_NORM}, ' ') AS w FROM documents),
toks AS (
  SELECT id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 1)),
           i -> array_to_string(list_slice(w, i, i + 2), ' ')))) AS tok
  FROM sp
),
sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY id),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b, n_common, sa.n AS n_a, sb.n AS n_b
FROM common
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE 100 * n_common >= 80 * (sa.n + sb.n - n_common)
ORDER BY id_a, id_b
""",
)
def dedup_ppjoin_exact_q(spark, sf_dir):
    """EXACT set-similarity join (word-trigram Jaccard >= 0.80) via PPJoin
    prefix filtering (Xiao et al. 2008): candidates meet only on each
    document's globally-rarest prefix shingles — a pair above the
    threshold MUST share one (pigeonhole), so the optimization is
    lossless, and the ORACLE proves it: DuckDB runs the un-optimized
    all-shared-tokens brute force and the results hash-match.  This is
    the exact-guarantee sibling of minhash LSH: no probability of a
    missed pair, at the cost of a verification join; stopwords never
    generate candidates because frequent shingles sort out of every
    prefix."""
    from steampipe_sqlite_spark.operators.dedup import ppjoin_pairs
    from steampipe_sqlite_spark.tables import load_table as _lt

    docs = _lt(spark, sf_dir, "documents")
    # orderBy + output-sized persist: see dedup_minhash_lsh (range-sort
    # sampling re-executes the verification tail otherwise; measured
    # 1.56 s → 1.23 s at sf0.1).
    pairs = persist_tracked(ppjoin_pairs(
        docs, "text", "doc_id", threshold_pct=80, shingle=3
    ))
    return pairs.orderBy("id_a", "id_b")


@query(
    "graph_bfs_distances",
    oracle="""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
nodes AS (SELECT doc_id AS node FROM documents),
edges AS (
  SELECT node AS src, (node * 31 + 7) % (SELECT n FROM nn) AS dst FROM nodes
  UNION ALL
  SELECT node AS src, (node * 17 + 3) % (SELECT n FROM nn) AS dst FROM nodes
),
d0 AS (SELECT node FROM nodes WHERE node < 5),
d1 AS (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN d0 ON e.src = d0.node
  WHERE e.dst NOT IN (SELECT node FROM d0)
),
d2 AS (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN d1 ON e.src = d1.node
  WHERE e.dst NOT IN (SELECT node FROM d0 UNION ALL SELECT node FROM d1)
),
d3 AS (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN d2 ON e.src = d2.node
  WHERE e.dst NOT IN (SELECT node FROM d0 UNION ALL SELECT node FROM d1
                      UNION ALL SELECT node FROM d2)
)
SELECT node, CAST(dist AS INT) AS dist FROM (
  SELECT node, 0 AS dist FROM d0
  UNION ALL SELECT node, 1 FROM d1
  UNION ALL SELECT node, 2 FROM d2
  UNION ALL SELECT node, 3 FROM d3
) u
ORDER BY dist, node
""",
)
def graph_bfs_distances_q(spark, sf_dir):
    """Bounded-depth BFS (3 hops from seeds doc_id < 5) over the synthetic
    doc graph (same two-out-edges construction as graph_pagerank) — the
    frontier-expansion Pregel shape; the oracle unrolls each depth as a
    CTE with an anti-membership guard, so frontier growth, dedup, and the
    visited-set exclusion are all hash-checked."""
    from steampipe_sqlite_spark.operators.graph import bfs_distances

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    nodes = docs.selectExpr("doc_id AS node")
    edges = nodes.selectExpr("node AS src", f"(node * 31 + 7) % {n} AS dst").unionAll(
        nodes.selectExpr("node AS src", f"(node * 17 + 3) % {n} AS dst")
    )
    seeds = nodes.where("node < 5")
    return bfs_distances(edges, seeds, max_depth=3).orderBy("dist", "node")


sql_query(
    "sketch_topk_tokens_by_lang",
    f"""
WITH counts AS (
  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT lang, explode(split({_SP_NORM}, ' ')) AS tok FROM documents) t
  GROUP BY lang, tok
)
SELECT lang, tok, c, rnk FROM (
  SELECT lang, tok, c,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS rnk
  FROM counts
) r
WHERE rnk <= 5
ORDER BY lang, rnk
""",
    oracle=f"""
WITH counts AS (
  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT lang, unnest(string_split({_DD_NORM}, ' ')) AS tok FROM documents) t
  GROUP BY lang, tok
)
SELECT lang, tok, c, rnk FROM (
  SELECT lang, tok, c,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS rnk
  FROM counts
) r
WHERE rnk <= 5
ORDER BY lang, rnk
""",
    present_sort=["lang", "rnk"],
)
# ^ Per-language top-5 tokens: the per-(lang, tok) count aggregate folds
# map-side; the rank window partitions by lang over the DISTINCT
# vocabulary (sub-linear in corpus rows by Heaps' law), so no per-lang
# single-reducer funnel of raw tokens; bounded 5-rows-per-lang final.


def _dd_cms_oracle(width: int = 64, depth: int = 4) -> str:
    """DuckDB replay of the CMS build + probe estimates + exact counts:
    same disjoint-md5-slice row hashes, same min-over-rows estimate."""
    probes = "('join'), ('hash'), ('vector'), ('data'), ('scan')"

    def pos(v: str, j: int) -> str:
        return (
            f"CAST('0x' || substring(md5({v}), {1 + 8 * j}, 8) AS BIGINT) % {width}"
        )

    rows_build = " UNION ALL ".join(
        f"SELECT {j} AS row, {pos('tok', j)} AS pos, tok FROM toks" for j in range(depth)
    )
    rows_probe = " UNION ALL ".join(
        f"SELECT value, {j} AS row, {pos('value', j)} AS pos FROM probes"
        for j in range(depth)
    )
    return f"""
WITH toks AS (SELECT unnest(string_split({_DD_NORM}, ' ')) AS tok FROM documents),
cells AS (
  SELECT row, pos, CAST(COUNT(*) AS BIGINT) AS c
  FROM ({rows_build}) h GROUP BY row, pos
),
probes AS (SELECT * FROM (VALUES {probes}) t(value)),
pcells AS ({rows_probe}),
est AS (
  -- LEFT join + COALESCE 0: zero-count cells are absent from the sparse
  -- sketch relation but still tighten the min (ADVICE r5 fix, mirrored
  -- in sketches.cms_estimate)
  SELECT p.value, CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS est
  FROM pcells p LEFT JOIN cells c ON p.row = c.row AND p.pos = c.pos
  GROUP BY p.value
),
exact AS (
  SELECT tok AS value, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM toks WHERE tok IN ('join', 'hash', 'vector', 'data', 'scan')
  GROUP BY tok
)
SELECT e.value AS tok, e.est, x.exact_n, e.est >= x.exact_n AS sound
FROM est e JOIN exact x ON e.value = x.value
ORDER BY tok
"""


@query("sketch_cms_token_counts", oracle=_dd_cms_oracle())
def sketch_cms_token_counts_q(spark, sf_dir):
    """Count-Min sketch (4×64 cells, disjoint-md5-slice row hashes) over
    the corpus token stream, probed for 5 known tokens — emits estimate,
    exact count, and the soundness bit (CMS never undercounts).  The
    sketch is a (row, pos, c) relation mergeable by per-cell SUM (the
    batch-fold property, pinned by test); the oracle replays build,
    probe, and min-over-rows estimate."""
    from steampipe_sqlite_spark.functions.sketches import cms_build, cms_estimate
    from steampipe_sqlite_spark.functions.text import _NORM_SQL

    docs = load_table(spark, sf_dir, "documents")
    # normalize the corpus ONCE (optimization r15): the token stream is
    # referenced twice (sketch build + the exact-count branch), and
    # unpersisted each branch re-ran the two regexp_replace passes over
    # every document.  The cache holds the NORMALIZED STRINGS (one row
    # per document — the same corpus-sized within-query state class as
    # ppjoin's r14 cache); the exploded token rows stay uncached, so each
    # branch re-splits from the cached string (cheap) instead of
    # re-regexing (the wall).  plans/r15/sketch_cms_token_counts_*.txt.
    from steampipe_sqlite_spark.operators.scale import persist_tracked

    normed = persist_tracked(
        docs.selectExpr(f"{_NORM_SQL.format(c='text')} AS norm")
    )
    toks = normed.selectExpr("explode(split(norm, ' ')) AS tok")
    sketch = cms_build(toks, "tok", width=64, depth=4)
    probes = spark.createDataFrame(
        [("join",), ("hash",), ("vector",), ("data",), ("scan",)], "value string"
    )
    est = cms_estimate(sketch, probes, "value", width=64, depth=4)
    exact = (
        toks.where("tok IN ('join', 'hash', 'vector', 'data', 'scan')")
        .groupBy(F.col("tok"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
    )
    return (
        est.join(exact, est.value == exact.tok)
        .selectExpr("tok", "est", "exact_n", "est >= exact_n AS sound")
        .orderBy("tok")
    )


sql_query(
    "dataset_snapshot_diff",
    """
WITH snap_a AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 10 <> 0
),
snap_b AS (
  SELECT doc_id, lang,
         n_chars + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS n_chars
  FROM documents WHERE doc_id % 10 <> 1
)
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'deleted'
            WHEN a.n_chars <> b.n_chars OR a.lang <> b.lang THEN 'modified'
            ELSE 'unchanged' END AS status,
       CASE WHEN a.doc_id IS NOT NULL AND b.doc_id IS NOT NULL
                 AND a.n_chars <> b.n_chars THEN 'n_chars' END AS changed_col
FROM snap_a a FULL OUTER JOIN snap_b b ON a.doc_id = b.doc_id
ORDER BY doc_id
""",
)
# ^ Snapshot row diff (change-data-feed between two table versions, the
# Delta/Iceberg table_changes analog): one FULL OUTER join on the key
# classifies every row added / deleted / modified / unchanged and names
# the changed column.  The parity-derived synthetic snapshots exercise
# all four branches; at scale the join is key-partitioned (one shuffle
# per side, or zero with bucketed snapshots — operators/scale
# write_bucketed).  Identical text both engines.


@query(
    "sketch_kmv_source_jaccard",
    oracle=f"""
WITH w AS (SELECT source, string_split({_DD_NORM}, ' ') AS w FROM documents),
toks AS (
  SELECT DISTINCT source AS grp, unnest(list_transform(
           generate_series(1, greatest(len(w) - 1, 1)),
           i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS tok
  FROM w
),
hashed AS (
  SELECT DISTINCT grp, CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h
  FROM toks
),
sig AS (
  SELECT grp, h FROM (
    SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS r
    FROM hashed) t
  WHERE r <= 128
),
paired AS (
  SELECT ga, gb, h FROM (
    SELECT ga, gb, h, ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY h) AS r
    FROM (
      SELECT DISTINCT a.grp AS ga, b.grp AS gb, u.h
      FROM sig a, sig b,
           LATERAL (SELECT a.h AS h UNION SELECT b.h) u
      WHERE a.grp < b.grp
    ) x) t
  WHERE r <= 128
)
SELECT p.ga AS src_a, p.gb AS src_b,
       CAST(SUM(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       CAST(COUNT(*) AS BIGINT) AS n_used
FROM paired p
LEFT JOIN sig sa ON sa.grp = p.ga AND sa.h = p.h
LEFT JOIN sig sb ON sb.grp = p.gb AND sb.h = p.h
GROUP BY p.ga, p.gb
ORDER BY src_a, src_b
""",
)
def sketch_kmv_source_jaccard_q(spark, sf_dir):
    """KMV set-operation sketch (Beyer et al. 2007): per-source bigram
    signatures (k=128 smallest distinct md5-60 hashes — signature-sized
    state per group, mergeable by re-min), pairwise Jaccard ESTIMATES for
    every source pair from the k smallest of each pair's signature union
    (= kmv(A∪B)) — the set-operation capability HLL registers lack.
    Measured |est − exact| ≈ 0.023 mean at k=128 on the fixture.  All
    integers end to end (n_both/n_used), so the estimates replay
    bit-exactly in DuckDB."""
    from steampipe_sqlite_spark.functions.sketches import (
        kmv_pairwise_jaccard,
        kmv_signatures,
    )
    from steampipe_sqlite_spark.functions.text import _NORM_SQL

    docs = load_table(spark, sf_dir, "documents")
    norm = _NORM_SQL.format(c="text")
    bigrams = docs.selectExpr("source", f"split({norm}, ' ') AS w").selectExpr(
        "source",
        "explode(transform(sequence(1, greatest(size(w) - 1, 1)),"
        " i -> array_join(slice(w, i, 2), ' '))) AS tok",
    )
    sig = kmv_signatures(bigrams, "tok", "source", k=128)
    return (
        kmv_pairwise_jaccard(sig, k=128)
        .selectExpr("ga AS src_a", "gb AS src_b", "n_both", "n_used")
        .orderBy("src_a", "src_b")
    )


# --- Round-6 additions: tokenizer prep, vocabulary dynamics, ordered ------
# --- novelty, matryoshka embeddings, systematic weighted sampling ---------


@query(
    "bpe_merge_step",
    oracle=f"""
WITH wc AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split({_DD_NORM}, ' ')) AS tok FROM documents)
  WHERE length(tok) >= 2
  GROUP BY tok),
pairs AS (
  SELECT substr(word, CAST(i AS INT), 2) AS pair, cnt
  FROM (SELECT word, cnt,
               unnest(generate_series(1, length(word) - 1)) AS i
        FROM wc)),
tot AS (
  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n
  FROM pairs GROUP BY pair)
SELECT pair, n, CAST(rnk AS INT) AS rnk FROM (
  SELECT pair, n, ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rnk
  FROM tot) r
WHERE rnk <= 20
ORDER BY rnk
""",
)
def bpe_merge_step_q(spark, sf_dir):
    """One BPE merge iteration (Sennrich et al. 2016, the public
    construction): count adjacent CHARACTER pairs across the corpus
    vocabulary weighted by word frequency and emit the top-20 merge
    candidates — the statistic a tokenizer-training pipeline computes
    per merge round over the full corpus.

    Scale shape: the pair stream explodes from the DISTINCT vocabulary
    (sub-linear in corpus rows by Heaps' law), weighted by the word
    counts aggregated map-side first — corpus tokens are touched exactly
    once, and the expensive explode runs over types, not tokens.
    All-integer counts ⇒ bit-exact in any engine."""
    from steampipe_sqlite_spark.functions.text import _NORM_SQL

    docs = load_table(spark, sf_dir, "documents")
    norm = _NORM_SQL.format(c="text")
    wc = (
        docs.selectExpr(f"explode(split({norm}, ' ')) AS tok")
        .where("length(tok) >= 2")
        .groupBy(F.col("tok").alias("word"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    pairs = wc.selectExpr(
        "explode(transform(sequence(1, length(word) - 1),"
        " i -> substring(word, i, 2))) AS pair",
        "cnt",
    )
    tot = pairs.groupBy("pair").agg(F.sum("cnt").cast("long").alias("n"))
    ranked = tot.selectExpr(
        "pair", "n",
        "CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS INT) AS rnk",
    ).where("rnk <= 20")
    return presentation_sort(ranked, ["rnk"])


# Nested replace() chain applying merges 1..8 in rank order: replace scans
# left-to-right over the CURRENT symbol sequence, which is exactly
# sequential BPE application restricted to first-round (base-character)
# merges.  Placeholders chr(65+i) = 'A'..'H' are outside the normalized
# alphabet (lowercase+digits+CJK), so a placeholder can never be half of a
# later literal pair.
_BPE_APPLY = "state"
for _i in range(1, 9):
    _BPE_APPLY = f"replace({_BPE_APPLY}, p{_i}, chr({64 + _i}))"


@query(
    "text_bpe_apply_fidelity",
    oracle=f"""
WITH wc AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split({_DD_NORM}, ' ')) AS tok FROM documents)
  WHERE length(tok) >= 2
  GROUP BY tok),
pairs AS (
  SELECT substr(word, CAST(i AS INT), 2) AS pair, cnt
  FROM (SELECT word, cnt,
               unnest(generate_series(1, length(word) - 1)) AS i
        FROM wc)),
ranked AS (
  SELECT pair, ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rnk
  FROM (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n FROM pairs GROUP BY pair)),
m AS (
  SELECT {", ".join(f"MAX(CASE WHEN rnk = {i} THEN pair END) AS p{i}" for i in range(1, 9))}
  FROM ranked WHERE rnk <= 8),
applied AS (
  SELECT word, cnt, {_BPE_APPLY} AS state
  FROM (SELECT word, cnt, word AS state FROM wc), m)
SELECT CAST(length(word) AS INT) AS wlen,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(cnt) AS BIGINT) AS n_occ,
       CAST(SUM(cnt * length(word)) AS BIGINT) AS chars_before,
       CAST(SUM(cnt * length(state)) AS BIGINT) AS tokens_after,
       CAST(SUM(cnt * (length(word) - length(state))) AS BIGINT) AS saved
FROM applied
GROUP BY 1
ORDER BY wlen
""",
)
def text_bpe_apply_fidelity(spark, sf_dir):
    """Tokenizer-fidelity audit (VERDICT r8 #7): learn the top-8 BPE merges
    from the corpus (same statistic as bpe_merge_step — Sennrich et al.
    2016) and APPLY them to the weighted vocabulary, measuring the
    resulting compression per word length: symbols before vs tokens after
    and merges fired, occurrence-weighted.  The whole merge table ships as
    ONE broadcast row (8 conditional-aggregate columns), so the apply pass
    is a single map-side nested-replace projection over the vocabulary —
    types, not tokens, get rewritten (Heaps'-law sublinear), and all
    outputs are integers (bit-exact in any engine).

    Precondition (documented, not guarded): the corpus yields ≥8 distinct
    character pairs — true of every documents fixture ≥ sf0.001."""
    from steampipe_sqlite_spark.functions.text import _NORM_SQL

    docs = load_table(spark, sf_dir, "documents")
    norm = _NORM_SQL.format(c="text")
    wc = (
        docs.selectExpr(f"explode(split({norm}, ' ')) AS tok")
        .where("length(tok) >= 2")
        .groupBy(F.col("tok").alias("word"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    pairs = wc.selectExpr(
        "explode(transform(sequence(1, length(word) - 1),"
        " i -> substring(word, i, 2))) AS pair",
        "cnt",
    )
    ranked = (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("n"))
        .selectExpr("pair", "ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rnk")
        .where("rnk <= 8")
    )
    merges = ranked.groupBy().agg(
        *[
            F.max(F.when(F.col("rnk") == i, F.col("pair"))).alias(f"p{i}")
            for i in range(1, 9)
        ]
    )
    applied = (
        wc.withColumn("state", F.col("word"))
        .crossJoin(F.broadcast(merges))
        .selectExpr("word", "cnt", f"{_BPE_APPLY} AS state")
    )
    out = applied.groupBy(
        F.length("word").cast("int").alias("wlen")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("cnt").cast("long").alias("n_occ"),
        F.sum(F.col("cnt") * F.length("word")).cast("long").alias("chars_before"),
        F.sum(F.col("cnt") * F.length("state")).cast("long").alias("tokens_after"),
        F.sum(F.col("cnt") * (F.length("word") - F.length("state")))
        .cast("long")
        .alias("saved"),
    )
    return presentation_sort(out, ["wlen"])


@query(
    "vocab_growth_curve",
    plan_cache=False,  # bakes distributed-helper offsets; see registry.query
    oracle=f"""
WITH first_seen AS (
  SELECT tok, CAST(MIN(doc_id) AS BIGINT) AS first_doc
  FROM (
    SELECT doc_id,
           array_to_string(toks[CAST(i AS BIGINT):CAST(i + 1 AS BIGINT)], ' ')
             AS tok
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, greatest(len(toks) - 1, 1))) AS i
          FROM (SELECT doc_id, string_split({_DD_NORM}, ' ') AS toks
                FROM documents)))
  GROUP BY tok),
per_bucket AS (
  SELECT first_doc // 50 AS bucket, CAST(COUNT(*) AS BIGINT) AS new_types
  FROM first_seen GROUP BY 1)
SELECT bucket, new_types,
       CAST(SUM(new_types) OVER (ORDER BY bucket
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
FROM per_bucket
ORDER BY bucket
""",
)
def vocab_growth_curve_q(spark, sf_dir):
    """Vocabulary growth curve (Heaps' law observable): distinct 2-gram
    types first seen per 50-doc bucket plus the cumulative vocabulary
    size — the curve a tokenizer/vocab-sizing pass reads off the corpus
    (2-gram types, because the fixture's unigram vocabulary saturates
    inside the first bucket — the bigram curve actually exhibits the
    Heaps tail).

    Scale shape: one groupBy(type) with map-side partial MIN over the
    gram stream (the only full-stream shuffle); the curve's running sum
    goes through operators/scale.distributed_running_sum because the
    bucket count SCALES with the corpus (n_docs/50 — unlike the per-day
    or per-histogram-bucket cumsum queries whose window input is
    domain-bounded), so the empty-OVER window form would single-
    partition it.  All integers."""
    from steampipe_sqlite_spark.functions.text import _NORM_SQL
    from steampipe_sqlite_spark.operators.scale import distributed_running_sum

    docs = load_table(spark, sf_dir, "documents")
    norm = _NORM_SQL.format(c="text")
    first_seen = (
        docs.selectExpr("doc_id", f"split({norm}, ' ') AS toks")
        .selectExpr(
            "doc_id",
            "explode(transform(sequence(1, greatest(size(toks) - 1, 1)),"
            " i -> array_join(slice(toks, i, 2), ' '))) AS tok",
        )
        .groupBy("tok")
        .agg(F.min("doc_id").cast("long").alias("first_doc"))
    )
    per_bucket = (
        first_seen.selectExpr("first_doc div 50 AS bucket")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("new_types"))
    )
    curve = distributed_running_sum(
        per_bucket, "new_types", [F.col("bucket")], name="cum_types"
    ).select("bucket", "new_types", "cum_types")
    return presentation_sort(curve, ["bucket"])


@query(
    "text_novelty_ordered",
    oracle=f"""
WITH grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[CAST(i AS BIGINT):CAST(i + 2 AS BIGINT)], ' ')
           AS gram
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS i
        FROM (SELECT doc_id, string_split({_DD_NORM}, ' ') AS toks
              FROM documents))),
flagged AS (
  SELECT doc_id, gram,
         MIN(doc_id) OVER (PARTITION BY gram) AS first_doc
  FROM grams)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
""",
)
def text_novelty_ordered_q(spark, sf_dir):
    """Ordered novelty score: per document, how many of its distinct
    3-gram shingles were never seen in any EARLIER document (doc order =
    ingest order) — the streaming-curation statistic that separates
    fresh content from recombinations of what the corpus already holds
    (the ordered complement of pairwise containment dedup).

    Scale shape: distinct grams per doc (map-side), ONE shuffle on gram
    for the min-doc window, one aggregate back on doc_id — never a
    doc×doc join; integer counts only (callers derive the fraction)."""
    from steampipe_sqlite_spark.functions.text import _NORM_SQL

    docs = load_table(spark, sf_dir, "documents")
    norm = _NORM_SQL.format(c="text")
    grams = (
        docs.selectExpr("doc_id", f"split({norm}, ' ') AS toks")
        .selectExpr(
            "doc_id",
            "explode(array_distinct(transform("
            "sequence(1, greatest(size(toks) - 2, 1)),"
            " i -> array_join(slice(toks, i, 3), ' ')))) AS gram",
        )
    )
    flagged = grams.selectExpr(
        "doc_id", "MIN(doc_id) OVER (PARTITION BY gram) AS first_doc"
    )
    out = (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.expr("CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return presentation_sort(out, ["doc_id"])


@query(
    "emb_matryoshka_fidelity",
    oracle="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
d AS (SELECT UNNEST([8, 16, 32]) AS dim)
SELECT vec_id, CAST(dim AS INT) AS dim,
       ROUND(SQRT(list_inner_product(e[1:dim], e[1:dim])
                  / list_inner_product(e, e)), 4) AS fidelity
FROM v, d
ORDER BY vec_id, dim
""",
)
def emb_matryoshka_fidelity_q(spark, sf_dir):
    """Matryoshka truncation fidelity (Kusupati et al. 2022 MRL, public
    construction): per vector and truncation width d ∈ {8,16,32}, the
    retained-norm fraction ||v[:d]||/||v|| — which IS the cosine between
    the full vector and its truncate-and-renormalize embedding, the
    number that decides how far a serving stack can shrink stored
    vectors.  Map-only (no shuffle, no join): each row emits its 3
    widths from one pass over the array; ROUND(_, 4) absorbs the
    cross-engine fold-order ulp like every cosine oracle here."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.selectExpr(
        "vec_id",
        "transform(embedding, x -> cast(x AS DOUBLE)) AS e",
    ).selectExpr(
        "vec_id",
        "e",
        "explode(array(8, 16, 32)) AS dim",
        "aggregate(e, 0d, (a, x) -> a + x * x) AS vv",
    ).selectExpr(
        "vec_id", "dim",
        "aggregate(slice(e, 1, dim), 0d, (a, x) -> a + x * x) AS dd",
        "vv",
    ).selectExpr(
        "vec_id", "CAST(dim AS INT) AS dim",
        "ROUND(SQRT(dd / vv), 4) AS fidelity",
    )
    return presentation_sort(rows, ["vec_id", "dim"])


@query(
    "sample_systematic_weighted",
    plan_cache=False,  # bakes distributed-helper offsets; see registry.query
    oracle="""
WITH w AS (
  SELECT doc_id, n_chars,
         CAST(SUM(n_chars) OVER (ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_w
  FROM documents),
t AS (
  SELECT GREATEST(CAST(SUM(n_chars) AS BIGINT) // 200, 1) AS step
  FROM documents)
SELECT doc_id, n_chars, cum_w
FROM w, t
WHERE cum_w // step > (cum_w - n_chars) // step
ORDER BY doc_id
""",
)
def sample_systematic_weighted_q(spark, sf_dir):
    """Systematic weighted sampling: walk the corpus in doc order and
    take a document whenever the cumulative character count crosses a
    step boundary (step = total/200) — every selection window holds
    ~equal data VOLUME, so long docs are proportionally likelier, with
    zero randomness (deterministic, replayable — the sampling contract
    the rest of the corpus uses md5 for, here achieved by position).

    Scale shape: the global cumulative sum runs through
    operators/scale.distributed_running_sum (range shuffle + local
    cumsum + driver prefix of per-partition TOTALS — one long each),
    never a single-partition window; the threshold test is a map-side
    integer filter.  All integers ⇒ bit-exact."""
    from steampipe_sqlite_spark.operators.scale import distributed_running_sum

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cum = distributed_running_sum(docs, "n_chars", ["doc_id"], name="cum_w")
    total = docs.agg(
        F.greatest(
            F.expr("CAST(SUM(n_chars) AS BIGINT) div 200"), F.lit(1)
        ).alias("step")
    )
    picked = (
        cum.crossJoin(F.broadcast(total))
        .where("cum_w div step > (cum_w - n_chars) div step")
        .select("doc_id", "n_chars", "cum_w")
    )
    return presentation_sort(picked, ["doc_id"])


@query(
    "agg_weighted_median",
    oracle="""
WITH per_len AS (
  SELECT lang, n_chars, CAST(SUM(n_chars) AS BIGINT) AS w
  FROM documents GROUP BY lang, n_chars),
cum AS (
  SELECT lang, n_chars, w,
         CAST(SUM(w) OVER (PARTITION BY lang ORDER BY n_chars
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
         CAST(SUM(w) OVER (PARTITION BY lang) AS BIGINT) AS tw
  FROM per_len)
SELECT lang,
       CAST(MIN(n_chars) AS BIGINT) AS wmedian_chars,
       CAST(MIN(tw) AS BIGINT) AS total_w
FROM cum
WHERE 2 * cw >= tw
GROUP BY lang
ORDER BY lang
""",
)
def agg_weighted_median_q(spark, sf_dir):
    """Byte-weighted median document length per language — the smallest
    length L such that docs of length ≤ L hold at least half the
    language's bytes (the curation statistic that answers "where does
    half my data actually live?", which the unweighted median wildly
    misstates on long-tailed corpora).  All-integer: weights, cumsums,
    and the 2·cum ≥ total threshold.

    Scale shape: lengths are COMPACTED first (one groupBy on
    (lang, n_chars) with map-side partials — the stream the window sees
    is distinct-lengths-sized, not corpus-sized), so the per-lang cumsum
    window never funnels raw rows through one reducer."""
    docs = load_table(spark, sf_dir, "documents")
    per_len = docs.groupBy("lang", "n_chars").agg(
        F.sum("n_chars").cast("long").alias("w")
    )
    cum = per_len.selectExpr(
        "lang", "n_chars", "w",
        "CAST(SUM(w) OVER (PARTITION BY lang ORDER BY n_chars"
        " ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw",
        "CAST(SUM(w) OVER (PARTITION BY lang) AS BIGINT) AS tw",
    )
    out = (
        cum.where("2 * cw >= tw")
        .groupBy("lang")
        .agg(
            F.min("n_chars").cast("long").alias("wmedian_chars"),
            F.min("tw").cast("long").alias("total_w"),
        )
    )
    return presentation_sort(out, ["lang"])


@query(
    "key_skew_profile",
    oracle="""
WITH per_key AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, user_id),
ranked AS (
  SELECT event_type, n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY n DESC, user_id) AS r
  FROM per_key)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS total_n,
       CAST(MAX(n) AS BIGINT) AS max_n,
       CAST((1000000 * MAX(n)) // SUM(n) AS BIGINT) AS top1_share_micro,
       CAST((1000000 * SUM(CASE WHEN r <= 10 THEN n ELSE 0 END)) // SUM(n)
         AS BIGINT) AS top10_share_micro
FROM ranked
GROUP BY event_type
ORDER BY event_type
""",
)
def key_skew_profile_q(spark, sf_dir):
    """Partition-key skew diagnostics: per event type, how concentrated
    the per-user event counts are (key cardinality, hottest key's share,
    top-10 share, in exact integer micros) — the profile that decides
    whether a downstream groupBy/join on this key needs salting or AQE
    skew handling BEFORE the job is launched at 100 TB.

    Scale shape: per-(type, key) counts fold map-side; the rank window
    runs over the per-key aggregate (keys, not events); integer //
    shares are order-free."""
    events = load_table(spark, sf_dir, "events")
    per_key = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ranked = per_key.selectExpr(
        "event_type", "n",
        "ROW_NUMBER() OVER (PARTITION BY event_type"
        " ORDER BY n DESC, user_id) AS r",
    )
    out = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("total_n"),
        F.max("n").cast("long").alias("max_n"),
        F.expr("CAST((1000000 * MAX(n)) div SUM(n) AS BIGINT)").alias(
            "top1_share_micro"
        ),
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN r <= 10 THEN n ELSE 0 END))"
            " div SUM(n) AS BIGINT)"
        ).alias("top10_share_micro"),
    )
    return presentation_sort(out, ["event_type"])


@query(
    "shard_by_bytes",
    plan_cache=False,  # bakes distributed-helper offsets; see registry.query
    oracle="""
WITH cum AS (
  SELECT doc_id, n_chars,
         CAST(SUM(n_chars) OVER (ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_w
  FROM documents),
assigned AS (
  SELECT doc_id, n_chars, (cum_w - n_chars) // 32768 AS shard
  FROM cum)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS shard_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM assigned
GROUP BY shard
ORDER BY shard
""",
)
def shard_by_bytes_q(spark, sf_dir):
    """Contiguous shard planning by byte budget (the webdataset/tar-shard
    layout step): walk the corpus in doc order and open a new ~32 KiB
    shard whenever the cumulative size crosses the budget — shard id =
    starting offset div budget, so shards are contiguous doc-id ranges
    by construction (the property a sequential trainer needs for
    locality) and every shard holds ≥ budget bytes except the last.

    Scale shape: the only global state is the prefix sum, computed via
    operators/scale.distributed_running_sum (range shuffle + local
    cumsum + driver-prefix of per-partition totals); assignment is a
    map-side integer division and the report is an ordinary hash
    aggregate over shard-count rows.  All integers ⇒ bit-exact."""
    from steampipe_sqlite_spark.operators.scale import distributed_running_sum

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cum = distributed_running_sum(docs, "n_chars", ["doc_id"], name="cum_w")
    assigned = cum.selectExpr(
        "doc_id", "n_chars", "(cum_w - n_chars) div 32768 AS shard"
    )
    out = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("shard_bytes"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )
    return presentation_sort(out, ["shard"])


@query(
    "graph_triangle_count",
    oracle="""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
nodes AS (SELECT doc_id AS node FROM documents),
raw AS (
  SELECT node AS src, (node * 31 + 7) % (SELECT n FROM nn) AS dst FROM nodes
  UNION ALL
  SELECT node AS src, (node * 17 + 3) % (SELECT n FROM nn) AS dst FROM nodes
),
e AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst),
tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM e ab
  JOIN e bc ON ab.b = bc.a
  JOIN e ac ON ac.a = ab.a AND ac.b = bc.b),
nodecnt AS (
  SELECT CAST(COUNT(DISTINCT x) AS BIGINT) AS n_nodes_in_edges
  FROM (SELECT a AS x FROM e UNION ALL SELECT b AS x FROM e)),
ecnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
SELECT n_nodes_in_edges, n_edges, n_triangles
FROM nodecnt, ecnt, tri
""",
)
def graph_triangle_count_q(spark, sf_dir):
    """Exact triangle count over the synthetic doc graph (same
    two-out-edges construction as pagerank/BFS): canonicalize to ordered
    undirected edges, then two equi-joins close each a<b<c wedge exactly
    once (Suri-Vassilvitskii MR formulation — the orientation bounds
    hub-node fan-out; never a node×node product).  The clustering
    statistic of the dedup graph — how cliquish the near-dup structure
    is."""
    from steampipe_sqlite_spark.operators.graph import triangle_count

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    edges = docs.selectExpr(
        "doc_id AS src", f"(doc_id * 31 + 7) % {n} AS dst"
    ).unionByName(
        docs.selectExpr("doc_id AS src", f"(doc_id * 17 + 3) % {n} AS dst")
    )
    return triangle_count(edges)


@query(
    "impute_by_group_median",
    oracle="""
WITH marked AS (
  SELECT event_type,
         CASE WHEN event_id % 7 = 0 THEN NULL
              ELSE CAST(ROUND(value * 100) AS BIGINT) END AS cents
  FROM events),
per_val AS (
  SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS c
  FROM marked WHERE cents IS NOT NULL
  GROUP BY event_type, cents),
cum AS (
  SELECT event_type, cents, c,
         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY cents
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS tot
  FROM per_val),
med AS (
  SELECT event_type, CAST(MIN(cents) AS BIGINT) AS median_cents
  FROM cum WHERE 2 * cc >= tot GROUP BY event_type)
SELECT m.event_type,
       CAST(SUM(CASE WHEN m.cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_imputed,
       CAST(SUM(CASE WHEN m.cents IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_observed,
       CAST(MIN(d.median_cents) AS BIGINT) AS median_cents,
       CAST(SUM(COALESCE(m.cents, d.median_cents)) AS BIGINT)
         AS total_cents_after
FROM marked m JOIN med d ON m.event_type = d.event_type
GROUP BY m.event_type
ORDER BY m.event_type
""",
)
def impute_by_group_median(spark, sf_dir):
    """Group-median imputation (the data-repair step before any numeric
    featurization): values deterministically masked (event_id % 7 = 0 —
    the fixture has no real nulls) are filled with their event type's
    EXACT median, and the audit rollup reports imputed/observed counts
    and the post-fill total, all integer cents.

    Scale shape: the median uses the agg_weighted_median compaction —
    per-(type, cents) counts first (map-side partials; the window sees
    distinct values, not events), the 2·cum ≥ total threshold picks the
    median, and the fill is a broadcast join of the 6-row median table
    back onto the stream."""
    events = load_table(spark, sf_dir, "events")
    marked = events.selectExpr(
        "event_type",
        "CASE WHEN event_id % 7 = 0 THEN NULL"
        " ELSE CAST(ROUND(value * 100) AS BIGINT) END AS cents",
    )
    per_val = (
        marked.where("cents IS NOT NULL")
        .groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cum = per_val.selectExpr(
        "event_type", "cents", "c",
        "CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY cents"
        " ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc",
        "CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS tot",
    )
    med = (
        cum.where("2 * cc >= tot")
        .groupBy("event_type")
        .agg(F.min("cents").cast("long").alias("median_cents"))
    )
    out = (
        marked.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr("CAST(SUM(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)")
            .alias("n_imputed"),
            F.expr(
                "CAST(SUM(CASE WHEN cents IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_observed"),
            F.min("median_cents").cast("long").alias("median_cents"),
            F.expr("CAST(SUM(COALESCE(cents, median_cents)) AS BIGINT)").alias(
                "total_cents_after"
            ),
        )
    )
    return presentation_sort(out, ["event_type"])


@query(
    "winsorized_length_stats",
    oracle="""
WITH per_len AS (
  SELECT lang, n_chars, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY lang, n_chars),
cum AS (
  SELECT lang, n_chars, c,
         CAST(SUM(c) OVER (PARTITION BY lang ORDER BY n_chars
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc,
         CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS tot
  FROM per_len),
bounds AS (
  SELECT lang,
         CAST(MIN(CASE WHEN 20 * cc >= tot THEN n_chars END) AS BIGINT) AS lo,
         CAST(MIN(CASE WHEN 20 * cc >= 19 * tot THEN n_chars END) AS BIGINT) AS hi
  FROM cum GROUP BY lang)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN d.n_chars < b.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_lo,
       CAST(SUM(CASE WHEN d.n_chars > b.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_hi,
       CAST(MIN(b.lo) AS BIGINT) AS p05,
       CAST(MIN(b.hi) AS BIGINT) AS p95,
       CAST(SUM(GREATEST(LEAST(d.n_chars, b.hi), b.lo)) AS BIGINT)
         AS winsorized_total
FROM documents d JOIN bounds b ON d.lang = b.lang
GROUP BY d.lang
ORDER BY d.lang
""",
)
def winsorized_length_stats(spark, sf_dir):
    """Winsorized (p05/p95-clamped) length statistics per language — the
    outlier-robust preprocessing step before any length-based curation
    rule; emits the exact discrete percentile bounds, clamp counts, and
    the clamped total (all integers).

    Scale shape: percentile bounds come from the (lang, n_chars)
    COMPACTED cumsum (the agg_weighted_median pattern — the window sees
    distinct lengths, not docs); the clamp pass is a broadcast join of
    the per-lang bounds table onto the stream."""
    docs = load_table(spark, sf_dir, "documents")
    per_len = docs.groupBy("lang", "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cum = per_len.selectExpr(
        "lang", "n_chars", "c",
        "CAST(SUM(c) OVER (PARTITION BY lang ORDER BY n_chars"
        " ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc",
        "CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS tot",
    )
    bounds = cum.groupBy("lang").agg(
        F.expr("CAST(MIN(CASE WHEN 20 * cc >= tot THEN n_chars END) AS BIGINT)")
        .alias("lo"),
        F.expr("CAST(MIN(CASE WHEN 20 * cc >= 19 * tot THEN n_chars END) AS BIGINT)")
        .alias("hi"),
    )
    out = (
        docs.join(F.broadcast(bounds), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("CAST(SUM(CASE WHEN n_chars < lo THEN 1 ELSE 0 END) AS BIGINT)")
            .alias("n_clamped_lo"),
            F.expr("CAST(SUM(CASE WHEN n_chars > hi THEN 1 ELSE 0 END) AS BIGINT)")
            .alias("n_clamped_hi"),
            F.min("lo").cast("long").alias("p05"),
            F.min("hi").cast("long").alias("p95"),
            F.expr("CAST(SUM(GREATEST(LEAST(n_chars, hi), lo)) AS BIGINT)")
            .alias("winsorized_total"),
        )
    )
    return presentation_sort(out, ["lang"])


@query(
    "dataset_split_temporal",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(ts) AS first_ts
  FROM events GROUP BY user_id),
assigned AS (
  SELECT user_id,
         CASE WHEN first_ts < TIMESTAMP '2024-01-01 04:00:00' THEN 'train'
              WHEN first_ts < TIMESTAMP '2024-01-01 12:00:00' THEN 'val'
              ELSE 'test' END AS split
  FROM first_seen)
SELECT a.split,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(epoch_us(e.ts)) AS BIGINT) AS min_ts_us,
       CAST(MAX(epoch_us(e.ts)) AS BIGINT) AS max_ts_us
FROM events e JOIN assigned a ON e.user_id = a.user_id
GROUP BY a.split
ORDER BY split
""",
)
def dataset_split_temporal(spark, sf_dir):
    """Temporal train/val/test split with USER-level leakage safety: a
    user belongs wholly to the split of their FIRST event (cutoffs at
    hours 4 / 12 of day one — the fixture's user arrivals concentrate
    there), so no user's history straddles the
    boundary — the时间 analog of dataset_split_leakage_safe's
    component-level hash gate.  The rollup's min/max event epochs make
    the (expected, documented) event-time overlap auditable: later
    EVENTS of an early-starting user stay in train by design.

    Scale shape: one map-side-partial MIN per user, broadcast-size
    assignment table joined back, one rollup."""
    events = load_table(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    assigned = first_seen.selectExpr(
        "user_id",
        "CASE WHEN first_ts < TIMESTAMP '2024-01-01 04:00:00' THEN 'train'"
        " WHEN first_ts < TIMESTAMP '2024-01-01 12:00:00' THEN 'val'"
        " ELSE 'test' END AS split",
    )
    out = (
        events.join(assigned, "user_id")
        .groupBy("split")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.expr("CAST(MIN(unix_micros(cast(ts AS TIMESTAMP))) AS BIGINT)")
            .alias("min_ts_us"),
            F.expr("CAST(MAX(unix_micros(cast(ts AS TIMESTAMP))) AS BIGINT)")
            .alias("max_ts_us"),
        )
    )
    return presentation_sort(out, ["split"])


# --- Round-6 continuation: co-occurrence mining, 2-hop reach ----------------


_LIFT_DD = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split({_DD_NORM}, ' ')) AS tok
        FROM documents)
  WHERE tok <> ''),
cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
top AS (
  SELECT tok, c FROM (
    SELECT tok, c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rnk FROM cnt)
  WHERE rnk <= 50),
tt AS (SELECT t.doc_id, t.tok, p.c FROM toks t JOIN top p ON t.tok = p.tok),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab,
         CAST(MIN(a.c) AS BIGINT) AS c_a, CAST(MIN(b.c) AS BIGINT) AS c_b
  FROM tt a JOIN tt b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY a.tok, b.tok)
SELECT tok_a, tok_b, n_ab, c_a, c_b,
       {_ppm_div('n_docs * n_ab', 'c_a * c_b', '//')} AS lift_ppm,
       rnk
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY n_ab DESC, tok_a, tok_b) AS INT)
              AS rnk
  FROM pairs) CROSS JOIN nd
WHERE rnk <= 30
ORDER BY rnk
"""

@query("token_pair_lift", oracle=_LIFT_DD)
def token_pair_lift(spark, sf_dir):
    """Token co-occurrence LIFT (PMI's exact-rational sibling: lift =
    P(ab)/(P(a)P(b)) = n_docs*n_ab/(c_a*c_b), emitted as exact floor-ppm —
    logarithms would hit the 1-ulp JVM/libm rule; lift is the
    exact-rational member of the Church & Hanks 1990 association-measure
    family).  Collocation mining is
    the phrase-detection primitive of every corpus-prep pipeline
    (word2vec phrase pass, n-gram vocab build).

    Scale shape: the top-50 vocabulary comes from orderBy+limit —
    TakeOrderedAndProject, a per-partition partial top-k with NO global
    window over the vocabulary (the SQL-window spelling the oracle uses
    would single-partition the distinct vocab; the DataFrame form keeps
    the same deterministic (c DESC, tok) total order).  The pair
    self-join is gated to that 50-token broadcast BEFORE exploding, so
    candidates are C(50,2)-bounded per doc, never corpus²; the closing
    rank window runs over <=1225 already-limited pair rows."""
    from steampipe_sqlite_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .where("tok <> ''")
        .distinct()
    )
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    top = cnt.orderBy(F.col("c").desc(), F.col("tok")).limit(50)
    tt = toks.join(F.broadcast(top), "tok").select("doc_id", "tok", "c")
    a = tt.selectExpr("doc_id", "tok AS tok_a", "c AS c_a")
    b = tt.selectExpr("doc_id", "tok AS tok_b", "c AS c_b")
    pairs = (
        a.join(b, ["doc_id"])
        .where("tok_a < tok_b")
        .groupBy("tok_a", "tok_b", "c_a", "c_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    top30 = pairs.orderBy(
        F.col("n_ab").desc(), F.col("tok_a"), F.col("tok_b")
    ).limit(30)
    # _ppm_div keeps every intermediate under den*1000 (ADVICE r6: the
    # single-step 1e6*n_docs*n_ab spelling wrapped BIGINT at ~9.2e12);
    # exact while c_a*c_b < 9.2e15 and n_docs*n_ab fits BIGINT.
    out = top30.crossJoin(F.broadcast(nd)).selectExpr(
        "tok_a", "tok_b", "n_ab", "c_a", "c_b",
        _ppm_div("n_docs * n_ab", "c_a * c_b", "div") + " AS lift_ppm",
        "CAST(ROW_NUMBER() OVER (ORDER BY n_ab DESC, tok_a, tok_b) AS INT)"
        " AS rnk",
    )
    return presentation_sort(out, ["rnk"])


@query(
    "graph_two_hop_reach",
    oracle="""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
nodes AS (SELECT doc_id AS node FROM documents),
edges AS (
  SELECT node AS src, (node * 31 + 7) % (SELECT n FROM nn) AS dst FROM nodes
  UNION ALL
  SELECT node AS src, (node * 17 + 3) % (SELECT n FROM nn) AS dst FROM nodes),
two_hop AS (
  SELECT DISTINCT e1.src AS src, e2.dst AS dst
  FROM edges e1 JOIN edges e2 ON e1.dst = e2.src),
reach AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS n_reach FROM two_hop GROUP BY src)
SELECT n_reach, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM reach
GROUP BY n_reach
ORDER BY n_reach
""",
)
def graph_two_hop_reach(spark, sf_dir):
    """2-hop reachability profile over the synthetic doc graph (same
    two-out-edges construction as graph_pagerank / graph_bfs_distances,
    llm.py:2496): distinct 2-hop endpoints per node, rolled up to a
    reach-count histogram — the neighborhood-size statistic feeding
    friend-of-friend features and sampling-fanout planning.

    ASSUMES doc_id is a contiguous 0-based range [0, n) (the fixture
    contract, same as graph_pagerank): (node*31+7) % n lands on an
    existing node only under that assumption — with sparse or 1-based
    ids the synthetic edges would dangle and the constant-out-degree
    reasoning below breaks (ADVICE r6).  For a real id space, derive dst
    from a dense rank over doc_id instead of modular arithmetic.

    Scale shape: out-degree is a constant 2, so the hop join produces
    exactly 4 candidates per node before dedup — linear in nodes, keyed
    on the join column; the histogram is a two-level hash aggregate.
    A power-law graph would need the high-degree-vertex split
    (salted_join_skewed_left); the docstring marks the swap point."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    nodes = docs.selectExpr("doc_id AS node")
    edges = nodes.selectExpr("node AS src", f"(node * 31 + 7) % {n} AS dst").unionAll(
        nodes.selectExpr("node AS src", f"(node * 17 + 3) % {n} AS dst")
    )
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    two_hop = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .select(F.col("e1.src").alias("src"), F.col("e2.dst").alias("dst"))
        .distinct()
    )
    reach = two_hop.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("n_reach")
    )
    out = reach.groupBy("n_reach").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    return presentation_sort(out, ["n_reach"])


_KFOLD_BODY = """
WITH ranked AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS {vtype})), doc_id)
           AS rn
  FROM documents)
SELECT lang, CAST((rn - 1) % 5 AS BIGINT) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM ranked
GROUP BY lang, fold
ORDER BY lang, fold
"""
# Stratified 5-fold assignment: within each language stratum, docs are
# ordered by a content-free md5 of their id (deterministic, seedless
# shuffle) and dealt round-robin, so every fold holds an equal share of
# every stratum (+/-1) — the leakage-safe eval-split primitive
# (dataset_split_temporal is the time-based sibling).  The rank window is
# PARTITIONED by lang: parallel across strata; a skewed mega-stratum
# would swap to distributed_row_number per stratum.
sql_query(
    "dataset_kfold_stratified",
    _KFOLD_BODY.format(vtype="STRING"),
    oracle=_KFOLD_BODY.format(vtype="VARCHAR"),
    present_sort=["lang", "fold"],
)


_CHI2_BODY = """
WITH obs AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source),
rt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS rtot FROM documents GROUP BY lang),
ct AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ctot FROM documents GROUP BY source),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
grid AS (
  SELECT rt.lang, ct.source, rt.rtot, ct.ctot,
         COALESCE(obs.o, 0) AS o
  FROM rt CROSS JOIN ct
  LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source),
deltas AS (
  SELECT CAST(o * (SELECT n FROM nn) - rtot * ctot AS {wide}) AS delta,
         CAST(rtot * ctot AS {wide}) AS rc
  FROM grid),
cells AS (
  SELECT CAST((delta * delta) {op} rc AS BIGINT) AS cell FROM deltas)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(cell) AS BIGINT) AS chi2_scaled_sum,
       CAST(1000 * SUM(cell) {op} (SELECT n FROM nn) AS BIGINT) AS chi2_milli
FROM cells
"""
# Pearson chi-square independence statistic for the lang x source
# contingency table — the drift/association screen (is language mix
# independent of source?).  chi2 = (1/n)*SUM((O*n - rt*ct)^2/(rt*ct));
# each cell is ONE exact integer floor-division (identical both engines;
# delta^2 grows as n^4, so the cell arithmetic runs in 38-digit integers
# — DECIMAL(38,0) on Spark, HUGEINT on DuckDB — exact to ~1e9 documents
# where BIGINT would wrap at ~5e4),
# so no float enters the hash; ZERO cells are materialized by the
# rowtotal x coltotal grid (a chi-square that skips empty cells is
# biased low).  Two tiny aggregates cross-joined — the grid is
# |langs| x |sources|, never corpus-sized.
sql_query(
    "stats_chi2_lang_source",
    _CHI2_BODY.format(op="div", wide="DECIMAL(38, 0)"),
    oracle=_CHI2_BODY.format(op="//", wide="HUGEINT"),
)


_HAPAX_SP_TOKS = "SELECT source, explode(split({norm}, ' ')) AS tok FROM documents"
_HAPAX_DD_TOKS = (
    "SELECT source, unnest(string_split({norm}, ' ')) AS tok FROM documents"
)
_HAPAX_BODY = """
WITH tok AS ({toks}),
cnt AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok WHERE tok <> '' GROUP BY source, tok)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000 {op} COUNT(*)
            AS BIGINT) AS hapax_share_ppm
FROM cnt
GROUP BY source
ORDER BY source
"""
# Hapax-legomena ratio per source: share of the vocabulary that occurs
# exactly once — the vocabulary-richness / OCR-noise screen (clean prose
# sits near ~40-60%, boilerplate collapses it, OCR garbage inflates it).
# Two-level hash aggregate over (source, token); the hapax test folds
# into the same pass as vocab/token totals.
sql_query(
    "text_hapax_ratio",
    _HAPAX_BODY.format(toks=_HAPAX_SP_TOKS.format(norm=_SP_NORM), op="div"),
    oracle=_HAPAX_BODY.format(toks=_HAPAX_DD_TOKS.format(norm=_DD_NORM), op="//"),
    present_sort=["source"],
)


@query(
    "emb_label_centroid_geometry",
    oracle="""
WITH q AS (
  -- dim derived from the array (parallel unnest/subscripts), never a
  -- hard-coded bound (ADVICE r7, eval_calibration_bins sibling fix)
  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS qv
  FROM embeddings),
s AS (
  SELECT label, pos, CAST(SUM(qv) AS BIGINT) AS sv
  FROM q GROUP BY label, pos),
n AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings GROUP BY label),
norms AS (
  SELECT label, CAST(SUM(sv * sv) AS BIGINT) AS norm_sq
  FROM s GROUP BY label),
pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
         CAST(SUM(a.sv * b.sv) AS BIGINT) AS dot_mm
  FROM s a JOIN s b ON a.pos = b.pos AND a.label < b.label
  GROUP BY a.label, b.label)
SELECT p.label_a, p.label_b, p.dot_mm,
       na.norm_sq AS norm_a_sq, nb.norm_sq AS norm_b_sq,
       cna.n AS n_a, cnb.n AS n_b
FROM pairs p
JOIN norms na ON na.label = p.label_a
JOIN norms nb ON nb.label = p.label_b
JOIN n cna ON cna.label = p.label_a
JOIN n cnb ON cnb.label = p.label_b
ORDER BY label_a, label_b
""",
)
def emb_label_centroid_geometry(spark, sf_dir):
    """Inter-class centroid geometry: per label pair, the exact inner
    product and squared norms of the UNNORMALIZED label centroid-sums
    over milli-quantized embeddings — cos(a,b) = dot/sqrt(na*nb) falls
    out caller-side.  Low inter-centroid cosine = separable classes; the
    class-overlap screen before training a probe.  Everything is BIGINT:
    quantize-to-integer FIRST, so the cross-row sums are fold-order-free
    (a double centroid would ULP-drift with partitioning; same trick as
    knn_cosine_int8).

    Scale shape: one posexplode shuffle to (label, dim) partials
    (map-side combine; 10 labels x 64 dims = 640 rows out), then all
    joins are on the tiny centroid frame.  Rows never pair with rows —
    classes do."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).selectExpr(
        "label", "pos", "CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS qv"
    )
    s = q.groupBy("label", "pos").agg(F.sum("qv").cast("long").alias("sv"))
    n = emb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n"))
    norms = s.groupBy("label").agg(
        F.expr("CAST(SUM(sv * sv) AS BIGINT)").alias("norm_sq")
    )
    a = s.selectExpr("label AS label_a", "pos", "sv AS sa")
    b = s.selectExpr("label AS label_b", "pos", "sv AS sb")
    pairs = (
        a.join(b, ["pos"])
        .where("label_a < label_b")
        .groupBy("label_a", "label_b")
        .agg(F.expr("CAST(SUM(sa * sb) AS BIGINT)").alias("dot_mm"))
    )
    out = (
        pairs.join(
            F.broadcast(norms.selectExpr("label AS label_a", "norm_sq AS norm_a_sq")),
            "label_a",
        )
        .join(
            F.broadcast(norms.selectExpr("label AS label_b", "norm_sq AS norm_b_sq")),
            "label_b",
        )
        .join(F.broadcast(n.selectExpr("label AS label_a", "n AS n_a")), "label_a")
        .join(F.broadcast(n.selectExpr("label AS label_b", "n AS n_b")), "label_b")
        .select(
            "label_a", "label_b", "dot_mm",
            "norm_a_sq", "norm_b_sq", "n_a", "n_b",
        )
    )
    return presentation_sort(out, ["label_a", "label_b"])


# log2-discount weights for nDCG@10, pre-rounded to integer ppm and shared
# by BOTH engines as literals — logarithms never run at query time (the
# 1-ulp JVM/libm rule), so DCG sums are exact integer arithmetic.
_NDCG_W = [
    (1, 1000000), (2, 630930), (3, 500000), (4, 430677), (5, 386853),
    (6, 356207), (7, 333333), (8, 315465), (9, 301030), (10, 289065),
]
_NDCG_W_VALUES = ", ".join(f"({r}, {w})" for r, w in _NDCG_W)


@query(
    "eval_ndcg_at10",
    oracle=f"""
WITH w(rank, wt) AS (VALUES {_NDCG_W_VALUES}),
top AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                              ORDER BY {_DD_COS} DESC, b.vec_id) AS rank
    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    WHERE a.vec_id < 10
  ) t WHERE rank <= 10),
rel AS (
  SELECT t.query_id, t.rank,
         CASE WHEN qa.label = nb.label THEN 1 ELSE 0 END AS rel
  FROM top t
  JOIN embeddings qa ON qa.vec_id = t.query_id
  JOIN embeddings nb ON nb.vec_id = t.neighbor_id),
ideal AS (
  SELECT query_id, rel,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rel DESC, rank) AS irk
  FROM rel),
d AS (
  SELECT r.query_id,
         CAST(SUM(r.rel) AS BIGINT) AS n_rel,
         CAST(SUM(r.rel * w.wt) AS BIGINT) AS dcg_scaled
  FROM rel r JOIN w ON w.rank = r.rank GROUP BY r.query_id),
i AS (
  SELECT query_id, CAST(SUM(rel * w.wt) AS BIGINT) AS idcg_scaled
  FROM ideal JOIN w ON w.rank = ideal.irk GROUP BY query_id)
SELECT d.query_id, d.n_rel, d.dcg_scaled, i.idcg_scaled,
       CAST(CASE WHEN i.idcg_scaled = 0 THEN 0
            ELSE d.dcg_scaled * 1000000 // i.idcg_scaled END AS BIGINT)
         AS ndcg_ppm
FROM d JOIN i ON i.query_id = d.query_id
ORDER BY d.query_id
""",
)
def eval_ndcg_at10(spark, sf_dir):
    """Retrieval-quality nDCG@10 of the exact cosine top-10 (first 10
    vectors as queries), relevance = neighbor shares the query's label
    (nDCG: Järvelin & Kekäläinen 2002, public construction).
    The log2 rank discounts are PRE-ROUNDED integer-ppm literals shared
    by both engines (_NDCG_W) so DCG / ideal-DCG are exact integer sums;
    ideal ranking re-sorts the retrieved list's relevances (rel DESC,
    rank tie-break).  The offline eval loop for every ANN variant here:
    swap the retrieval CTE, keep the metric.

    Scale shape: rides brute_force_topk (broadcast queries, streamed
    corpus); everything after the top-k is 100 rows."""
    from steampipe_sqlite_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    top = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 10), "embedding", "vec_id", k=10
    ).select("query_id", "neighbor_id", "rank")
    lab = emb.select("vec_id", "label")
    rel = (
        top.join(
            F.broadcast(lab.selectExpr("vec_id AS query_id", "label AS ql")),
            "query_id",
        )
        .join(lab.selectExpr("vec_id AS neighbor_id", "label AS nl"), "neighbor_id")
        .selectExpr(
            "query_id", "rank", "CASE WHEN ql = nl THEN 1 ELSE 0 END AS rel"
        )
    )
    warr = "array({})".format(
        ", ".join(str(w) for _, w in _NDCG_W)
    )
    scored = rel.selectExpr(
        "query_id", "rel",
        f"rel * element_at({warr}, rank) AS dterm",
        "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, rank)"
        " AS irk",
    ).selectExpr(
        "query_id", "rel", "dterm",
        f"rel * element_at({warr}, irk) AS iterm",
    )
    out = scored.groupBy("query_id").agg(
        F.sum("rel").cast("long").alias("n_rel"),
        F.sum("dterm").cast("long").alias("dcg_scaled"),
        F.sum("iterm").cast("long").alias("idcg_scaled"),
    ).selectExpr(
        "query_id", "n_rel", "dcg_scaled", "idcg_scaled",
        "CAST(CASE WHEN idcg_scaled = 0 THEN 0"
        " ELSE dcg_scaled * 1000000 div idcg_scaled END AS BIGINT) AS ndcg_ppm",
    )
    return presentation_sort(out, ["query_id"])


_FUZZY_BODY = """
WITH p AS (
  SELECT doc_id, substring({norm}, 1, 24) AS pre FROM documents),
pa AS (
  SELECT doc_id, pre FROM p WHERE {bytelen}(pre) = length(pre)),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS edit_dist
  FROM pa a JOIN pa b
    ON substring(a.pre, 1, 6) = substring(b.pre, 1, 6)
   AND a.doc_id < b.doc_id
   AND abs(length(a.pre) - length(b.pre)) <= 3)
SELECT doc_a, doc_b, edit_dist
FROM cand
WHERE edit_dist <= 3
ORDER BY doc_a, doc_b
"""
# Blocked fuzzy self-join (record linkage): candidates meet only inside a
# 6-char-prefix block with a +/-3 length gate (the length filter is the
# same pigeonhole bound PPJoin uses: |len(a)-len(b)| > k implies
# edit_dist > k), then exact Levenshtein <= 3 verifies the 24-char
# normalized prefixes — computed ONCE in the candidate projection (Spark
# does not share subexpressions across Filter and Project, so the
# SELECT+WHERE spelling would run the O(24x24) DP twice per pair).
# The octet_length(pre) = length(pre) gate restricts pairs to pure-ASCII
# prefixes: Spark's levenshtein counts CODEPOINT edits while DuckDB's
# counts BYTE edits, so any CJK character (which the corpus
# normalization deliberately preserves) would make the engines disagree
# on the distance; on ASCII the two metrics coincide.  Byte length is
# octet_length on Spark, strlen on DuckDB (its octet_length is BLOB-only).  Prefix blocking is the classic
# deterministic
# blocking strategy; candidate cost is sum of block^2, never corpus^2 —
# a skewed mega-block (all docs opening identically) would salt the key
# with a length bucket or swap to dedup_ppjoin_exact's token-prefix
# filter, which is skew-free by construction.
#
# r14: converted from the pure-SQL spelling to DataFrame form for two
# measured reasons (tools/neardup_scale_probe.py fuzzy arm at 5M docs):
# (1) the self-join's two CTE references each recomputed the normalize —
# persisting the 24-char prefixes runs it ONCE; (2) the normalize itself
# moved off java.util.regex (which loses its fast path on a multi-range
# character class — ~3 us/row measured) onto the RE2-backed Arrow batch
# path (functions.text.normalize_text_arrow_udf), the same regex engine
# the oracle runs.  Oracle unchanged; the hash match is the equivalence
# proof.
@query(
    "join_fuzzy_blocked_prefix",
    oracle=_FUZZY_BODY.format(norm=_DD_NORM, bytelen="strlen"),
)
def join_fuzzy_blocked_prefix_q(spark, sf_dir):
    from steampipe_sqlite_spark.functions.text import normalize_text_arrow_udf

    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text_arrow_udf()
    pa_ = (
        docs.select(
            "doc_id", F.substring(norm(F.col("text")), 1, 24).alias("pre")
        )
        .filter("octet_length(pre) = length(pre)")
        .persist()  # normalized ONCE, read by both join sides
    )
    a, b = pa_.alias("a"), pa_.alias("b")
    cand = a.join(
        b,
        (F.expr("substring(a.pre, 1, 6)") == F.expr("substring(b.pre, 1, 6)"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.expr("abs(length(a.pre) - length(b.pre)) <= 3")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.expr("CAST(levenshtein(a.pre, b.pre) AS BIGINT)").alias("edit_dist"),
    )
    # orderBy, not presentation_sort: the pair output GROWS with the
    # corpus (linear by blocking), and presentation_sort's coalesce(1)
    # would collapse the join's reduce stage — join + levenshtein on one
    # core (measured 52 s of the probe's 55 s at 5M docs; the sql_query
    # form had the same defect via present_sort).  The parallel range
    # sort is the documented unbounded-result path.
    return cand.filter("edit_dist <= 3").orderBy("doc_a", "doc_b")


_VOCAB_JAC_SP_TOKS = (
    "SELECT DISTINCT lang, tok FROM "
    "(SELECT lang, explode(split({norm}, ' ')) AS tok FROM documents) "
    "WHERE tok <> ''"
)
_VOCAB_JAC_DD_TOKS = (
    "SELECT DISTINCT lang, tok FROM "
    "(SELECT lang, unnest(string_split({norm}, ' ')) AS tok FROM documents) t "
    "WHERE tok <> ''"
)
_VOCAB_JAC_BODY = """
WITH vt AS ({toks}),
sizes AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM vt GROUP BY lang),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM vt a JOIN vt b ON a.tok = b.tok AND a.lang < b.lang
  GROUP BY a.lang, b.lang)
SELECT i.lang_a, i.lang_b, i.n_shared, sa.n AS n_a, sb.n AS n_b,
       CAST(i.n_shared * 1000000
            {op} (sa.n + sb.n - i.n_shared) AS BIGINT) AS jaccard_ppm
FROM inter i
JOIN sizes sa ON sa.lang = i.lang_a
JOIN sizes sb ON sb.lang = i.lang_b
ORDER BY i.lang_a, i.lang_b
"""
# Inter-language vocabulary overlap (exact Jaccard over distinct-token
# sets): high en/de overlap flags code-switching or mislabeled language
# IDs; near-zero zh/en is the sanity anchor.  Languages meet only on
# SHARED tokens (equi-join on the distinct vocab — sub-linear by Heaps'
# law), the |langs|-row size table joins onto a |pairs|-row result.
sql_query(
    "text_vocab_jaccard_langs",
    _VOCAB_JAC_BODY.format(toks=_VOCAB_JAC_SP_TOKS.format(norm=_SP_NORM), op="div"),
    oracle=_VOCAB_JAC_BODY.format(toks=_VOCAB_JAC_DD_TOKS.format(norm=_DD_NORM), op="//"),
    present_sort=["lang_a", "lang_b"],
)


_KANON_BODY = """
WITH classes AS (
  SELECT lang, source, CAST(n_chars {op} 500 AS BIGINT) AS len_bucket,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM documents
  GROUP BY lang, source, CAST(n_chars {op} 500 AS BIGINT))
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(k) AS BIGINT) AS n_rows,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
         AS rows_at_risk_k5,
       CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_at_risk_k5,
       CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS singleton_classes
FROM classes
"""
# k-anonymity audit over the quasi-identifier (lang, source, 500-char
# length bucket): a row whose QI class has k < 5 peers is
# re-identifiable by joining on those attributes alone — the release
# gate privacy reviews run before publishing a corpus.  min_k IS the
# dataset's k-anonymity level; singletons are the worst offenders.
# One hash aggregate to classes (map-side partial), one 1-row fold.
sql_query(
    "privacy_k_anonymity",
    _KANON_BODY.format(op="div"),
    oracle=_KANON_BODY.format(op="//"),
)


# --- Round-7 additions (register behind the driver window; r8 rotation) ---


@query(
    "dedup_soft_weights",
    oracle=f"""
WITH fp AS (
  SELECT doc_id, md5({_DD_NORM}) AS fp FROM documents
),
sized AS (
  SELECT doc_id,
         CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS cluster_size
  FROM fp
)
SELECT doc_id, cluster_size,
       CAST(1000000 // cluster_size AS BIGINT) AS weight_ppm
FROM sized
ORDER BY doc_id
""",
)
def dedup_soft_weights_q(spark, sf_dir):
    """Soft deduplication: every document KEPT, weighted 1/cluster_size.

    Hard dedup (keep one row per fingerprint) throws away the duplicate
    count, but a pretraining sampler often wants the inverse-frequency
    weight instead — each duplicate cluster contributes one document's
    worth of expected mass wherever it appears, without choosing a
    canonical copy (Lee et al. 2022 discuss duplication-induced
    memorization; downweighting is the non-destructive mitigation).

    Scale shape: ONE hash shuffle (window partitioned by the md5
    fingerprint — equal keys co-locate, every partition independent), no
    join back, no global window.  weight_ppm is exact integer division so
    the hash-compare never sees engine float formatting."""
    from steampipe_sqlite_spark.functions.text import _NORM_SQL

    docs = load_table(spark, sf_dir, "documents")
    norm = _NORM_SQL.format(c="text")
    sized = docs.selectExpr("doc_id", f"md5({norm}) AS fp").selectExpr(
        "doc_id",
        "CAST(count(1) OVER (PARTITION BY fp) AS BIGINT) AS cluster_size",
    )
    # orderBy: one row per document (unbounded) — parallel range sort
    return sized.selectExpr(
        "doc_id",
        "cluster_size",
        "CAST(1000000 div cluster_size AS BIGINT) AS weight_ppm",
    ).orderBy("doc_id")


_BITEXT_K = 4  # neighbors per side in the margin denominator


@query(
    "bitext_margin_pairs",
    oracle=f"""
WITH base AS (
  SELECT e.vec_id AS id, d.lang, e.embedding
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
),
pairs AS (
  SELECT a.id AS qid, b.id AS tid,
         CAST(ROUND({_DD_COS} * 10000) AS BIGINT) AS cu
  FROM (SELECT id, embedding FROM base WHERE lang = 'en' AND id < 20) a(id, embedding),
       (SELECT id, embedding FROM base WHERE lang = 'de') b(id, embedding)
),
ranked AS (
  SELECT qid, tid, cu,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cu DESC, tid) AS rx,
         ROW_NUMBER() OVER (PARTITION BY tid ORDER BY cu DESC, qid) AS ry
  FROM pairs
),
summed AS (
  SELECT qid, tid, cu, rx,
         SUM(CASE WHEN rx <= {_BITEXT_K} THEN cu END) OVER (PARTITION BY qid) AS sx,
         SUM(CASE WHEN ry <= {_BITEXT_K} THEN cu END) OVER (PARTITION BY tid) AS sy
  FROM ranked
)
SELECT qid AS query_id, tid AS match_id, cu AS cos_u,
       CAST(CASE WHEN cu >= 0 AND sx + sy > 0
                 THEN (2 * {_BITEXT_K} * cu * 1000000) // (sx + sy) END
            AS BIGINT) AS margin_ppm
FROM summed
WHERE rx = 1
ORDER BY query_id
""",
)
def bitext_margin_pairs_q(spark, sf_dir):
    """Margin-scored bitext mining (Artetxe & Schwenk 2019): for each
    source-language document, its best target-language match scored by
    the RATIO margin — cosine divided by the mean of both sides' k-NN
    cosines — which suppresses hub vectors that are "close to
    everything" and is the standard mined-parallel-corpus filter
    (CCMatrix/LASER pipelines).

    margin(x,y) = cos(x,y) / (mean_k cos(x,NN_tgt(x))/2
                              + mean_k cos(y,NN_src(y))/2)

    Scale shape: the source side is a BOUNDED query batch (broadcast —
    the corpus' established ANN-query convention), the target corpus
    streams through one BroadcastNestedLoopJoin, and BOTH k-NN means come
    from the same bounded pair table via two partitioned windows: no
    second pass over either corpus, no global window.  A production
    symmetric run replaces the brute-force leg with the IVF index on each
    side; the margin algebra is unchanged.  cos is 4-dp scaled to BIGINT
    (the knn convention) and the margin is exact integer division guarded
    to non-negative operands, so Spark's truncating div and DuckDB's
    flooring // cannot diverge."""
    from steampipe_sqlite_spark.operators.similarity import _cos_sql
    from steampipe_sqlite_spark.functions.vectors import norm_sql

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "lang"
    )
    base = emb.join(docs, emb.vec_id == docs.doc_id).selectExpr(
        "vec_id AS id",
        "lang",
        "embedding AS v",
        f"{norm_sql('embedding')} AS nrm",
    )
    src = base.where("lang = 'en' AND id < 20").selectExpr(
        "id AS qid", "v AS qv", "nrm AS qn"
    )
    tgt = base.where("lang = 'de'").selectExpr(
        "id AS tid", "v AS tv", "nrm AS tn"
    )
    pairs = tgt.crossJoin(F.broadcast(src)).selectExpr(
        "qid",
        "tid",
        f"CAST(ROUND({_cos_sql('qv', 'tv', 'qn', 'tn')} * 10000) AS BIGINT) AS cu",
    )
    ranked = pairs.selectExpr(
        "qid",
        "tid",
        "cu",
        "ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cu DESC, tid) AS rx",
        "ROW_NUMBER() OVER (PARTITION BY tid ORDER BY cu DESC, qid) AS ry",
    )
    summed = ranked.selectExpr(
        "qid",
        "tid",
        "cu",
        "rx",
        f"SUM(CASE WHEN rx <= {_BITEXT_K} THEN cu END)"
        " OVER (PARTITION BY qid) AS sx",
        f"SUM(CASE WHEN ry <= {_BITEXT_K} THEN cu END)"
        " OVER (PARTITION BY tid) AS sy",
    )
    out = summed.where("rx = 1").selectExpr(
        "qid AS query_id",
        "tid AS match_id",
        "cu AS cos_u",
        "CAST(CASE WHEN cu >= 0 AND sx + sy > 0"
        f" THEN (2 * {_BITEXT_K} * cu * 1000000) div (sx + sy) END"
        " AS BIGINT) AS margin_ppm",
    )
    return presentation_sort(out, ["query_id"])


@query(
    "dedup_keep_best",
    oracle=_DD_NEARDUP_CLOSURE + """,
ranked AS (
  SELECT c.component_id, c.doc_id, d.n_chars,
         CAST(COUNT(*) OVER (PARTITION BY c.component_id) AS BIGINT)
           AS component_size,
         ROW_NUMBER() OVER (PARTITION BY c.component_id
                            ORDER BY d.n_chars DESC, c.doc_id) AS rn
  FROM comps c JOIN documents d USING (doc_id)
)
SELECT component_id, doc_id AS kept_doc_id,
       CAST(n_chars AS BIGINT) AS kept_n_chars,
       component_size,
       CAST(component_size - 1 AS BIGINT) AS n_dropped
FROM ranked WHERE rn = 1
ORDER BY component_id
""",
)
def dedup_keep_best_q(spark, sf_dir):
    """The step after clustering that pair lists and component labels
    alone don't deliver: ONE canonical document per near-duplicate
    cluster, chosen by keep-the-longest (n_chars DESC, doc_id tiebreak) —
    the standard production rule when near-dups are truncations/excerpts
    of each other.  Same 3-gram-Jaccard edge set and distributed hash-min
    connected components as dedup_components; the canonical choice is one
    component-keyed window over the labeled nodes.

    Scale shape: blocked exact pair join (lang, source) → CC (frontier
    iterations with localCheckpoint) → one hash-partitioned window; no
    global operator, output one row per cluster."""
    from pyspark.sql import Window

    from steampipe_sqlite_spark.operators.dedup import ngram_jaccard_pairs
    from steampipe_sqlite_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", ["lang", "source"], n=3, threshold=0.3
    )
    comps = connected_components(
        pairs,
        src="id_a",
        dst="id_b",
        nodes=docs.select(F.col("doc_id").alias("node")),
    ).select(F.col("node").alias("doc_id"), F.col("component").alias("component_id"))
    ranked = comps.join(docs.select("doc_id", "n_chars"), "doc_id").select(
        "component_id",
        "doc_id",
        "n_chars",
        F.count(F.lit(1))
        .over(Window.partitionBy("component_id"))
        .cast("bigint")
        .alias("component_size"),
        F.row_number()
        .over(
            Window.partitionBy("component_id").orderBy(
                F.desc("n_chars"), F.col("doc_id")
            )
        )
        .alias("rn"),
    )
    out = ranked.where("rn = 1").selectExpr(
        "component_id",
        "doc_id AS kept_doc_id",
        "CAST(n_chars AS BIGINT) AS kept_n_chars",
        "component_size",
        "CAST(component_size - 1 AS BIGINT) AS n_dropped",
    )
    # orderBy: one row per cluster (scales with the corpus) — range sort
    return out.orderBy("component_id")


# Shared centroid-classifier CTE chain (DuckDB side): milli-quantized
# vectors, per-label integer centroid sums (dim derived from the array —
# ADVICE r7), cosine scoring against every centroid, argmax prediction.
# eval_calibration_bins and eval_confusion_matrix both consume `pred`.
_CENTROID_PRED_DD = """
WITH q AS (
  SELECT vec_id, label,
         [CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS qx
  FROM embeddings),
u AS (
  SELECT label, generate_subscripts(qx, 1) AS i, unnest(qx) AS v FROM q),
s AS (
  SELECT label AS clabel, i AS pos, CAST(SUM(v) AS BIGINT) AS sv
  FROM u GROUP BY label, i),
cent AS (
  SELECT clabel, list(sv ORDER BY pos) AS cv,
         CAST(SUM(sv * sv) AS BIGINT) AS cnorm_sq
  FROM s GROUP BY clabel),
scored AS (
  SELECT q.vec_id, q.label, c.clabel,
         ROUND(list_inner_product(CAST(q.qx AS DOUBLE[]), CAST(c.cv AS DOUBLE[]))
               / (SQRT(list_inner_product(CAST(q.qx AS DOUBLE[]), CAST(q.qx AS DOUBLE[])))
                  * SQRT(CAST(c.cnorm_sq AS DOUBLE))), 4) AS cos4
  FROM q CROSS JOIN cent c),
pred AS (
  SELECT vec_id, label, clabel AS predicted, cos4,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos4 DESC, clabel) AS rn
  FROM scored)
"""


def _centroid_predictions(spark, sf_dir):
    """Spark side of the shared centroid-classifier chain: one (label,
    dim) partial-agg shuffle builds the 10×64 integer centroids, which
    broadcast onto the corpus scan; the argmax is a vec_id-keyed window
    over a corpus×10 frame — nothing global, nothing corpus².  Returns
    (vec_id, label, predicted, cos4)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.selectExpr(
        "vec_id",
        "label",
        "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qx",
    )
    s = q.select(
        F.col("label").alias("clabel"), F.posexplode("qx").alias("pos", "v")
    ).groupBy("clabel", "pos").agg(F.sum("v").cast("long").alias("sv"))
    cent = s.groupBy("clabel").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, sv))), e -> e.sv) AS cv"),
        F.expr("CAST(SUM(sv * sv) AS BIGINT) AS cnorm_sq"),
    )
    scored = q.crossJoin(F.broadcast(cent)).selectExpr(
        "vec_id",
        "label",
        "clabel",
        "ROUND(aggregate(zip_with(qx, cv, (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)),"
        " 0.0e0, (acc, x) -> acc + x)"
        " / (SQRT(aggregate(transform(qx, a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE)),"
        " 0.0e0, (acc, x) -> acc + x)) * SQRT(CAST(cnorm_sq AS DOUBLE))), 4) AS cos4",
    )
    return scored.selectExpr(
        "vec_id",
        "label",
        "clabel AS predicted",
        "cos4",
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos4 DESC, clabel) AS rn",
    ).where("rn = 1")


@query(
    "eval_calibration_bins",
    oracle=_CENTROID_PRED_DD
    + """
SELECT CAST(FLOOR(cos4 * 10) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN predicted = label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(SUM(CAST(ROUND(cos4 * 10000) AS BIGINT)) AS BIGINT) AS sum_conf_u
FROM pred WHERE rn = 1
GROUP BY CAST(FLOOR(cos4 * 10) AS BIGINT)
ORDER BY bin
""",
)
def eval_calibration_bins_q(spark, sf_dir):
    """Reliability-diagram data for a 1-NN-centroid classifier over the
    embedding corpus: every vector is scored against each label's
    centroid-sum, the argmax cosine is its prediction and confidence,
    and the output is per-confidence-bin (width 0.1) counts, hit counts,
    and the exact confidence mass — ECE = Σ n_b/N·|acc_b − conf_b| falls
    out caller-side (Guo et al. 2017's binned estimator; the emissions
    stay exact integers per the corpus convention).

    Numeric discipline: embeddings are milli-quantized to BIGINT FIRST
    (fold-order-free centroid sums — the emb_label_centroid_geometry /
    knn_cosine_int8 trick), the integer dot is exact, and only the final
    cosine is a 4-dp-rounded double (the knn convention).  Binning uses
    CAST(FLOOR(..)) — DuckDB's double→BIGINT cast rounds while Spark's
    truncates.

    Scale shape: one (label, dim) partial-agg shuffle builds the
    centroids (10×64 rows), which broadcast onto the corpus scan; the
    argmax is a vec_id-keyed window over a corpus×10 frame and the bins
    are one hash aggregate — nothing global, nothing corpus² (the chain
    is shared with eval_confusion_matrix via _centroid_predictions)."""
    pred = _centroid_predictions(spark, sf_dir)
    out = pred.groupBy(
        F.expr("CAST(FLOOR(cos4 * 10) AS BIGINT)").alias("bin")
    ).agg(
        F.expr("CAST(COUNT(*) AS BIGINT) AS n"),
        F.expr(
            "CAST(SUM(CASE WHEN predicted = label THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_correct"
        ),
        F.expr(
            "CAST(SUM(CAST(ROUND(cos4 * 10000) AS BIGINT)) AS BIGINT) AS sum_conf_u"
        ),
    )
    return presentation_sort(out, ["bin"])


@query(
    "mining_hard_negatives",
    oracle=f"""
WITH pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS tid, a.label AS qlabel,
         (a.label = b.label) AS same,
         CAST(ROUND({_DD_COS} * 10000) AS BIGINT) AS cu
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 15
),
ranked AS (
  SELECT qid, tid, qlabel, same, cu,
         ROW_NUMBER() OVER (PARTITION BY qid, same ORDER BY cu DESC, tid) AS rn
  FROM pairs
)
SELECT p.qid AS anchor_id, p.qlabel AS label,
       p.tid AS positive_id, p.cu AS pos_cos_u,
       n.tid AS negative_id, n.cu AS neg_cos_u,
       CAST(p.cu - n.cu AS BIGINT) AS margin_u
FROM ranked p JOIN ranked n ON p.qid = n.qid
WHERE p.same AND p.rn = 1 AND NOT n.same AND n.rn = 1
ORDER BY anchor_id
""",
)
def mining_hard_negatives_q(spark, sf_dir):
    """Triplet mining for contrastive training: per anchor (bounded query
    batch), the most-similar SAME-label vector (the positive) and the
    most-similar DIFFERENT-label vector (the hard negative — the example
    that actually moves a contrastive loss; Schroff et al. 2015 /
    Robinson et al. 2021), plus the anchor's margin between them.
    margin_u ≤ 0 flags anchors whose nearest neighbor crosses the class
    boundary — the triplets a curriculum feeds first.

    Scale shape: the anchor batch broadcasts onto the streaming corpus
    (one pair table, linear in the corpus), ONE window ranks positives
    and negatives together (partitioned by anchor AND the same-label
    flag), and the positive/negative rows meet again on the anchor key —
    bounded both sides.  Cosines are 4-dp scaled BIGINTs; the margin is
    an exact integer difference."""
    from steampipe_sqlite_spark.operators.similarity import _cos_sql, _prep

    emb = load_table(spark, sf_dir, "embeddings")
    base = _prep(emb, "embedding", "vec_id").join(
        emb.selectExpr("vec_id AS id", "label"), "id"
    )
    anchors = base.where("id < 15").selectExpr(
        "id AS qid", "v AS qv", "nrm AS qn", "label AS qlabel"
    )
    pairs = base.selectExpr("id AS tid", "v AS tv", "nrm AS tn", "label AS tlabel").join(
        F.broadcast(anchors), F.expr("qid <> tid")
    ).selectExpr(
        "qid",
        "tid",
        "qlabel",
        "(qlabel = tlabel) AS same",
        f"CAST(ROUND({_cos_sql('qv', 'tv', 'qn', 'tn')} * 10000) AS BIGINT) AS cu",
    )
    # persist the bounded (≤ 2×|batch| rows) winners: pos and neg both
    # derive from this frame, and without the persist each branch would
    # re-execute the full corpus pair scan (the plan showed the scan
    # twice); with it the corpus is read once and the tiny pos⋈neg join
    # broadcasts
    ranked = pairs.selectExpr(
        "qid",
        "tid",
        "qlabel",
        "same",
        "cu",
        "ROW_NUMBER() OVER (PARTITION BY qid, same ORDER BY cu DESC, tid) AS rn",
    ).where("rn = 1")
    ranked = persist_tracked(ranked)
    pos = ranked.where("same").selectExpr(
        "qid AS anchor_id", "qlabel AS label", "tid AS positive_id", "cu AS pos_cos_u"
    )
    neg = ranked.where("NOT same").selectExpr(
        "qid AS anchor_id", "tid AS negative_id", "cu AS neg_cos_u"
    )
    out = pos.join(F.broadcast(neg), "anchor_id").selectExpr(
        "anchor_id",
        "label",
        "positive_id",
        "pos_cos_u",
        "negative_id",
        "neg_cos_u",
        "CAST(pos_cos_u - neg_cos_u AS BIGINT) AS margin_u",
    )
    return presentation_sort(out, ["anchor_id"])


# --- round-8 additions ------------------------------------------------------


@query(
    "eval_confusion_matrix",
    oracle=_CENTROID_PRED_DD
    + """
SELECT label, predicted,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CAST(ROUND(cos4 * 10000) AS BIGINT)) AS BIGINT) AS sum_conf_u
FROM pred WHERE rn = 1
GROUP BY label, predicted
ORDER BY label, predicted
""",
)
def eval_confusion_matrix_q(spark, sf_dir):
    """Confusion matrix of the 1-NN-centroid classifier (the
    eval_calibration_bins model, shared via _centroid_predictions):
    per (true label, predicted label) vector counts plus the exact
    integer confidence mass — precision/recall/F1 per class fall out
    caller-side.  The standard eval companion to the calibration bins.

    Scale shape: identical to the calibration query — (label, dim)
    partial-agg centroids broadcast, vec_id-keyed argmax window, one
    ≤|labels|² hash aggregate at the end."""
    pred = _centroid_predictions(spark, sf_dir)
    out = pred.groupBy("label", "predicted").agg(
        F.expr("CAST(COUNT(*) AS BIGINT) AS n_vecs"),
        F.expr(
            "CAST(SUM(CAST(ROUND(cos4 * 10000) AS BIGINT)) AS BIGINT) AS sum_conf_u"
        ),
    )
    return presentation_sort(out, ["label", "predicted"])


# l-diversity audit: the companion to privacy_k_anonymity — a
# quasi-identifier group can be large (k-anonymous) yet still leak if
# every member shares one sensitive value.  Sensitive attribute here:
# the 200-char length bucket, spelled n_chars - (n_chars % 200) so both
# engines bin identically on integers (no FLOOR-vs-round cast trap).
# One hash aggregate over the quasi columns — trivially scale-safe.
sql_query(
    "privacy_l_diversity",
    """
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT n_chars - (n_chars % 200)) AS BIGINT) AS l_diversity,
       CAST(MIN(n_chars - (n_chars % 200)) AS BIGINT) AS min_bucket
FROM documents
GROUP BY lang, source
ORDER BY lang, source
""",
    present_sort=["lang", "source"],
)


_ZIPF_BODY = """
WITH tok AS ({toks}),
cnt AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
  FROM tok WHERE tok <> '' GROUP BY tok)
"""


@query(
    "text_zipf_band_counts",
    oracle=_ZIPF_BODY.format(
        toks="SELECT unnest(string_split({norm}, ' ')) AS tok FROM documents".format(
            norm=_DD_NORM
        )
    )
    + """
SELECT CAST(length(bin(rnk)) - 1 AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(freq) AS BIGINT) AS sum_freq,
       CAST(MIN(freq) AS BIGINT) AS min_freq,
       CAST(MAX(freq) AS BIGINT) AS max_freq
FROM (SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rnk FROM cnt)
GROUP BY 1 ORDER BY band
""",
    plan_cache=False,
)
def text_zipf_band_counts(spark, sf_dir):
    """Zipf rank-frequency profile of the corpus vocabulary: tokens
    ranked by global frequency, grouped into octave bands
    (band = floor(log2(rank)) via length(bin(rank))-1 — exact integer
    arithmetic in both engines, no float log at power-of-two
    boundaries), emitting per band the type count and frequency mass.
    A Zipfian corpus shows sum_freq roughly flat across bands; OCR noise
    and boilerplate bend the tail — the standard corpus-health fit input
    (Zipf 1949).

    Scale shape: the vocabulary grows with the corpus (Heaps' law), so
    the global rank runs through operators/scale.distributed_row_number
    over the per-token AGGREGATE — never an empty-OVER window over an
    unbounded input; the band rollup is one ≤64-group hash aggregate."""
    from steampipe_sqlite_spark.functions.text import tokens
    from steampipe_sqlite_spark.operators.scale import distributed_row_number

    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .where("tok <> ''")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    ranked = distributed_row_number(
        cnt, [F.desc("freq"), F.col("tok")], name="rnk"
    )
    out = ranked.groupBy(
        F.expr("CAST(length(bin(rnk)) - 1 AS BIGINT)").alias("band")
    ).agg(
        F.expr("CAST(COUNT(*) AS BIGINT) AS n_types"),
        F.expr("CAST(SUM(freq) AS BIGINT) AS sum_freq"),
        F.expr("CAST(MIN(freq) AS BIGINT) AS min_freq"),
        F.expr("CAST(MAX(freq) AS BIGINT) AS max_freq"),
    )
    return presentation_sort(out, ["band"])


# One synchronous label-propagation step over the synthetic doc graph
# (same two-out-edges construction as pagerank/BFS/triangles): seed label
# = doc_id % 5; each node adopts the smallest label among its neighbors'
# most-frequent labels (min-of-argmax = the deterministic tie-break that
# makes LP oracle-checkable).  Community detection's cheapest primitive
# (Raghavan et al. 2007) — one step is a pure relational program, so the
# WHOLE text is shared verbatim by both engines: edges → both directions →
# neighbor-label counts → per-node argmax → adoption census.
# Scale shape: two hash aggregates keyed on node and one window keyed on
# node — frontier-incident work, no node×node product anywhere.
sql_query(
    "graph_label_prop_step",
    """
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
e0 AS (
  SELECT doc_id AS src, (doc_id * 31 + 7) % (SELECT n_docs FROM n) AS dst
  FROM documents
  UNION ALL
  SELECT doc_id AS src, (doc_id * 17 + 3) % (SELECT n_docs FROM n) AS dst
  FROM documents),
und AS (
  SELECT src, dst FROM e0 WHERE src <> dst
  UNION ALL
  SELECT dst AS src, src AS dst FROM e0 WHERE src <> dst),
votes AS (
  SELECT src AS node, dst % 5 AS nlabel, CAST(COUNT(*) AS BIGINT) AS c
  FROM und GROUP BY src, dst % 5),
adopted AS (
  SELECT node, nlabel AS new_label
  FROM (SELECT node, nlabel,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, nlabel) AS rn
        FROM votes)
  WHERE rn = 1)
SELECT new_label,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(CASE WHEN new_label <> node % 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed
FROM adopted
GROUP BY new_label
ORDER BY new_label
""",
    present_sort=["new_label"],
)


@query(
    "emb_power_iteration_step",
    oracle="""
WITH q AS (
  SELECT vec_id,
         [CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS qx
  FROM embeddings),
u AS (
  SELECT vec_id, generate_subscripts(qx, 1) - 1 AS pos, unnest(qx) AS v FROM q),
rs AS (
  SELECT vec_id, pos, v, SUM(v) OVER (PARTITION BY vec_id) AS rowsum FROM u)
SELECT CAST(pos AS BIGINT) AS pos, CAST(SUM(v * rowsum) AS BIGINT) AS gram_v
FROM rs GROUP BY pos ORDER BY pos
""",
)
def emb_power_iteration_step(spark, sf_dir):
    """One power-iteration matvec over the embedding Gram matrix with the
    all-ones start vector: out = (Σ_docs x xᵀ)·1 = Σ_docs x·sum(x) —
    computed WITHOUT materializing the 64×64 Gram matrix, as a single
    pass that weights each milli-quantized vector by its own coordinate
    sum.  The first step of dominant-eigenvector extraction (power
    method; von Mises & Pollaczek-Geiringer 1929) — the building block
    behind PCA-whitening checks on embedding spaces.  All-integer, so
    the cross-engine hash is exact at any fold order.

    Scale shape: one posexplode + one (pos) hash aggregate — map-side
    partials reduce 64 longs per partition; no shuffle carries vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qx",
    )
    rs = q.selectExpr(
        "vec_id",
        "aggregate(qx, 0L, (acc, x) -> acc + x) AS rowsum",
        "qx",
    ).select(F.col("rowsum"), F.posexplode("qx").alias("pos", "v"))
    out = rs.groupBy(F.col("pos").cast("long").alias("pos")).agg(
        F.expr("CAST(SUM(v * rowsum) AS BIGINT) AS gram_v")
    )
    return presentation_sort(out, ["pos"])
