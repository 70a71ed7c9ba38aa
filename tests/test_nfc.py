"""nfc_normalize_udf: parity with unicodedata on hard forms, and the
ASCII-gated union shape used by the text_nfc_dedup corpus entry."""

import unicodedata

from pyspark.sql import functions as F

from steampipe_sqlite_spark.functions.text import nfc_normalize_udf

# NOTE: items 0/1 and 3/4 are composed-vs-DECOMPOSED byte twins; the
# first assertion in test_matches_unicodedata guards the source bytes
# themselves, so an editor NFC-normalizing this file fails loudly
# instead of making the collapse checks vacuous.
FORMS = [
    "café",              # composed
    "café",             # decomposed -> must equal composed
    "ñö",         # multiple combining marks
    "ṩ",                 # s with dot below and dot above, composed
    "ṩ",          # same, fully decomposed
    "각",     # Hangul jamo -> composes to one syllable
    "ﬃ",                 # ffi ligature: NFC keeps it (NFKC's job)
    "plain ascii",
    "",
]


def test_matches_unicodedata(spark):
    # source-byte guard: the twins must be byte-DISTINCT pre-normalization
    assert FORMS[0] != FORMS[1] and FORMS[3] != FORMS[4], (
        "test source was unicode-normalized; restore decomposed literals"
    )
    df = spark.createDataFrame([(s,) for s in FORMS], ["s"])
    nfc = nfc_normalize_udf()
    got = [r.v for r in df.select(nfc(F.col("s")).alias("v")).collect()]
    want = [unicodedata.normalize("NFC", s) for s in FORMS]
    assert got == want
    # the two decomposed/composed pairs collapse
    assert got[0] == got[1] and got[3] == got[4]


def test_null_passthrough(spark):
    df = spark.createDataFrame([(None,), ("x",)], "s string")
    nfc = nfc_normalize_udf()
    got = {r.s: r.v for r in df.select("s", nfc(F.col("s")).alias("v")).collect()}
    assert got[None] is None and got["x"] == "x"


def test_ascii_gate_union_preserves_rows(spark):
    """The corpus entry's scale shape: ASCII rows bypass the Python
    stage; the union must cover every input row exactly once and agree
    with normalizing everything."""
    rows = [(i, s) for i, s in enumerate(FORMS * 3)]
    df = spark.createDataFrame(rows, ["i", "s"])
    is_ascii = F.col("s").rlike("^[\\x00-\\x7F]*$")
    nfc = nfc_normalize_udf()
    gated = df.filter(is_ascii).select("i", F.col("s").alias("n")).unionByName(
        df.filter(~is_ascii).select("i", nfc(F.col("s")).alias("n"))
    )
    got = {r.i: r.n for r in gated.collect()}
    assert len(got) == len(rows)
    for i, s in rows:
        assert got[i] == unicodedata.normalize("NFC", s), (i, s)
