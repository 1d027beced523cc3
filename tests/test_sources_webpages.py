"""Sources: CSV helpers (reference L4/L5) and the webpages corpus of
BASELINE.json input_hint — end-to-end build over (url, warc_ts, html,
text, lang) with deterministic doc ids from a global url order, plus
the byte-identical text-extraction invariant."""

import pytest
from pyspark.sql import functions as F

from lucene_clj_spark import create_index
from lucene_clj_spark.sources import (
    extract_text_from_html,
    read_csv_docs,
    split_multivalued,
    synthesize_webpages,
)


def test_split_multivalued(spark):
    df = spark.createDataFrame(
        [("Rock, Folk  ,Blues",), ("", ), ("Jazz",)], ["g"]
    )
    got = [r["s"] for r in df.select(
        split_multivalued(F.col("g")).alias("s")).collect()]
    assert got == [["Rock", "Folk", "Blues"], [], ["Jazz"]]


def test_read_csv_docs(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("name,tags\nalpha,\"a, b\"\nbeta,c\n")
    df = read_csv_docs(spark, str(p), multi_valued=["tags"])
    rows = {r["name"]: r["tags"] for r in df.collect()}
    assert rows == {"alpha": ["a", "b"], "beta": ["c"]}


@pytest.fixture(scope="module")
def webpages(spark):
    return synthesize_webpages(spark, 200, seed=7).cache()


def test_webpages_deterministic(spark, webpages):
    again = synthesize_webpages(spark, 200, seed=7)
    a = sorted(r["text"] for r in webpages.collect())
    b = sorted(r["text"] for r in again.collect())
    assert a == b


def test_html_extraction_byte_identical_per_url(spark, webpages):
    """Per-row invariant (input_hint): extracted text from html is
    byte-identical to the stored text column for every url."""
    bad = (
        webpages.withColumn(
            "ex", extract_text_from_html(F.col("html"))
        )
        .filter(F.col("ex") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_webpages_index_end_to_end(spark, webpages):
    idx = create_index(
        spark,
        webpages.select("url", "text", "lang"),
        {"url": "keyword", "text": "text", "lang": "keyword"},
        order_by=["url"],  # dense doc ids from global url order
    )
    # doc ids dense 0..N-1 and aligned with sorted urls
    ids = [r["doc_id"] for r in idx.docs.select("doc_id").collect()]
    assert sorted(ids) == list(range(200))
    urls = [
        r["url"]
        for r in idx.docs.orderBy("doc_id").select("url").collect()
    ]
    assert urls == sorted(urls)
    # a common term returns ranked hits
    hits = idx.search("search", field_name="text", with_hit=False).collect()
    assert hits and all(h["score"] > 0 for h in hits)
    # tokenizer edge cases survived the round trip: "don't" is a term
    terms = {r["term"] for r in idx.terms.select("term").collect()}
    assert "don't" in terms or "3.14" in terms


def test_webpages_doc_ids_stable_across_parallelism(spark, webpages):
    """SURVEY.md §7 hard-part #4: doc ids must not depend on partition
    layout."""
    from lucene_clj_spark.indexer import assign_dense_ids

    a = assign_dense_ids(webpages.repartition(2), ["url"])
    b = assign_dense_ids(webpages.repartition(13), ["url"])
    ma = {r["url"]: r["doc_id"] for r in a.select("url", "doc_id").collect()}
    mb = {r["url"]: r["doc_id"] for r in b.select("url", "doc_id").collect()}
    assert ma == mb


def test_url_parts_goldens(spark):
    from lucene_clj_spark.sources import url_parts

    rows = [
        (0, "https://www.shop.example.co.uk/a/b?q=1#frag"),
        (1, "http://example.com"),
        (2, "https://user:pw@deep.sub.host.org:8443/path"),
        (3, "ftp://files.company.com.au/pub/"),
        (4, "https://localhost/x"),
        (5, "HTTPS://WWW.Example.COM/CaseSensitivePath"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    got = {r["doc_id"]: r for r in url_parts(df).collect()}
    r0 = got[0]
    assert (r0["scheme"], r0["host"], r0["path"]) == (
        "https", "www.shop.example.co.uk", "/a/b")
    assert r0["registered_domain"] == "example.co.uk"  # 2-label suffix
    r1 = got[1]
    assert (r1["host"], r1["path"]) == ("example.com", "")
    assert r1["registered_domain"] == "example.com"
    r2 = got[2]  # userinfo and port stripped
    assert r2["host"] == "deep.sub.host.org"
    assert r2["registered_domain"] == "host.org"
    r3 = got[3]
    assert r3["scheme"] == "ftp"
    assert r3["registered_domain"] == "company.com.au"
    r4 = got[4]  # single-label host maps to itself
    assert r4["host"] == r4["registered_domain"] == "localhost"
    r5 = got[5]  # scheme/host are case-insensitive (RFC 3986);
    # the path keeps its case
    assert (r5["scheme"], r5["host"]) == ("https", "www.example.com")
    assert r5["registered_domain"] == "example.com"
    assert r5["path"] == "/CaseSensitivePath"


def test_url_parts_ipv6_and_schemeless(spark):
    """ADVICE r04: bracket hosts keep the full IPv6 literal (the :port
    strip must not truncate inside the address); scheme-less inputs
    parse to empty scheme/host/registered_domain — the documented
    unparseable-URL flag."""
    from lucene_clj_spark.sources import url_parts

    rows = [
        (0, "http://[::1]:8080/x"),
        (1, "https://[2001:DB8::1]/path"),
        (2, "http://user@[::1]:9/y"),
        (3, "example.com/no-scheme"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    got = {r["doc_id"]: r for r in url_parts(df).collect()}
    assert got[0]["host"] == "[::1]" and got[0]["path"] == "/x"
    assert got[1]["host"] == "[2001:db8::1]"  # lowercased, no port
    assert got[2]["host"] == "[::1]"  # userinfo stripped first
    assert (got[3]["scheme"], got[3]["host"],
            got[3]["registered_domain"]) == ("", "", "")


def test_host_stats_aggregates_per_domain(spark):
    from lucene_clj_spark.sources import host_stats

    rows = [
        (0, "https://a.x.com/1", 10),
        (1, "https://b.x.com/2", 20),
        (2, "https://a.x.com/3", 30),
        (3, "https://only.y.org/1", 5),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "nb"])
    got = {r["registered_domain"]: r
           for r in host_stats(df, size_col="nb").collect()}
    assert got["x.com"]["n_pages"] == 3
    assert got["x.com"]["n_hosts"] == 2
    assert got["x.com"]["total_size"] == 60
    assert got["y.org"]["n_pages"] == 1 and got["y.org"]["n_hosts"] == 1
