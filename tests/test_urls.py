"""canonical_url: per-case expectations + invariants.

Expected values are hand-derived from the documented step list
(functions/urls.py); the DuckDB twin is exercised end-to-end by the
dedup_url_canonical oracle pairing in the driver gate.
"""

from pyspark.sql import functions as F

from steampipe_sqlite_spark.functions.urls import canonical_url

CASES = [
    # (raw, canonical)
    (
        "HTTPS://WWW.Site.COM:443/A//b/?utm_source=feed&id=1#frag",
        "https://site.com/A/b?id=1",
    ),
    ("https://site.com/a/b?id=1", "https://site.com/a/b?id=1"),
    # default port stripped only for the matching scheme
    ("http://host.org:80/x", "http://host.org/x"),
    ("http://host.org:443/x", "http://host.org:443/x"),
    ("https://host.org:8443/x", "https://host.org:8443/x"),
    # bare host -> '/', trailing slash stripped elsewhere
    ("https://Example.com", "https://example.com/"),
    ("https://example.com/", "https://example.com/"),
    ("https://example.com/a/", "https://example.com/a"),
    # duplicate slashes collapse; path case preserved
    ("https://e.com//A///B//", "https://e.com/A/B"),
    # params sorted byte-wise; tracking stripped incl. bare `ref`
    (
        "https://e.com/p?z=26&a=1&utm_medium=rss&ref&gclid=g&fbclid=f",
        "https://e.com/p?a=1&z=26",
    ),
    # all-tracking query drops the '?'
    ("https://e.com/p?utm_source=x&ref=hp", "https://e.com/p"),
    # query with no path
    ("https://e.com?b=2&a=1", "https://e.com/?a=1&b=2"),
    # empty params from && are dropped; later '?' stays inside the param
    ("https://e.com/p?a=1&&b=2?c", "https://e.com/p?a=1&b=2?c"),
    # fragment-only tail; whitespace trimmed
    ("  https://e.com/p#x  ", "https://e.com/p"),
    # refparam is NOT the tracking param `ref` (anchored match)
    ("https://e.com/p?refparam=1", "https://e.com/p?refparam=1"),
    # non-http scheme: ports kept, host still lowercased
    ("FTP://Mirror.net:21/Pub/", "ftp://mirror.net:21/Pub"),
]


def test_cases_match_expected(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in CASES], ["u"])
    got = [r.c for r in df.select(canonical_url(F.col("u")).alias("c")).collect()]
    for (raw, want), g in zip(CASES, got):
        assert g == want, f"{raw!r}: {g!r} != {want!r}"


def test_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) for every case."""
    df = spark.createDataFrame([(raw,) for raw, _ in CASES], ["u"])
    two = df.select(
        canonical_url(F.col("u")).alias("c1"),
        canonical_url(canonical_url(F.col("u"))).alias("c2"),
    )
    bad = two.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, f"not idempotent: {bad}"


def test_grammar_exhaustive_invariants(spark):
    """Exhaustive sweep over the modeled messiness grammar (~1.7k
    combinations in ONE Spark job): idempotence plus the output
    invariants the canonicalizer promises — no fragment, no default
    port, no duplicate/trailing path slashes, no tracking params,
    params sorted."""
    import itertools

    schemes = ["https://", "HTTPS://", "http://"]
    wwws = ["", "www.", "WWW."]
    hosts = ["Ex.com"]
    ports = ["", ":443", ":8080"]
    paths = ["", "/", "/A//b", "/A/b/"]
    queries = [
        "",
        "?z=1&a=2",
        "?utm_source=x",
        "?a=2&utm_medium=y&z=1",
        "?ref",
    ]
    frags = ["", "#f"]
    urls = [
        "".join(parts)
        for parts in itertools.product(schemes, wwws, hosts, ports, paths, queries, frags)
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    out = df.select(
        "u",
        canonical_url(F.col("u")).alias("c1"),
        canonical_url(canonical_url(F.col("u"))).alias("c2"),
    ).collect()
    assert len(out) == len(urls)
    for r in out:
        c = r.c1
        assert r.c2 == c, f"not idempotent: {r.u!r} -> {c!r} -> {r.c2!r}"
        assert "#" not in c, (r.u, c)
        assert not c.startswith("https://www."), (r.u, c)
        host_and_rest = c.split("://", 1)[1]
        assert ":443" not in host_and_rest.split("/", 1)[0] or not c.startswith(
            "https"
        ), (r.u, c)
        path = "/" + host_and_rest.split("/", 1)[1] if "/" in host_and_rest else ""
        path = path.split("?", 1)[0]
        assert "//" not in path, (r.u, c)
        assert path == "/" or not path.endswith("/"), (r.u, c)
        if "?" in c:
            params = c.split("?", 1)[1].split("&")
            assert params == sorted(params), (r.u, c)
            assert all(
                not p.startswith(("utm_", "gclid", "fbclid"))
                and p != "ref"
                and not p.startswith("ref=")
                for p in params
            ), (r.u, c)
