"""Corpus-prep operator tests: dedup family, ANN, text analysis."""

import pytest
from pyspark.sql import functions as F

from lucene_clj_spark.functions import ann, dedup
from lucene_clj_spark.functions import text as textfn


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy cat again and again"),
        (3, "completely different content about spark query engines here"),
        (4, "spark query engines here completely different content about"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(dup_docs):
    groups = dedup.exact_dedup_groups(dup_docs).collect()
    m = {r["keep_id"]: r["n_copies"] for r in groups}
    assert m[0] == 2 and m[2] == 1 and m[3] == 1 and m[4] == 1
    dropped = dedup.exact_duplicates(dup_docs).collect()
    assert [(r["doc_id"], r["duplicate_of"]) for r in dropped] == [(1, 0)]


def test_exact_dedup_strict_key(dup_docs):
    groups = dedup.exact_dedup_groups(dup_docs, strict=True).collect()
    m = {r["keep_id"]: r["n_copies"] for r in groups}
    assert m[0] == 2 and len(m) == 4


def test_exact_dedup_shuffles_hashes_not_bodies(dup_docs):
    """Scale contract: the exchange partitions on the 16-byte content
    digest and the text column is pruned below it — document bodies
    never shuffle (VERDICT r01 finding 2)."""
    for df in (
        dedup.exact_dedup_groups(dup_docs),
        dedup.exact_duplicates(dup_docs),
    ):
        s = df._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(__h" in s
        assert "hashpartitioning(text" not in s
        # below the exchange only digest+id columns flow
        below = s.split("hashpartitioning(__h", 1)[1]
        assert "md5(cast(text" in below  # hash computed map-side
        ex_args = s.split("hashpartitioning(__h", 1)[0]
        assert "Sort [text" not in ex_args


def test_ngram_jaccard_finds_near_dup(dup_docs):
    pairs = dedup.ngram_jaccard_pairs(
        dup_docs, n=3, threshold=0.3, max_shingle_df=100
    ).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    assert got[(0, 1)] == 1.0           # exact dup
    assert (0, 2) in got                # one-word-changed near dup
    assert (0, 3) not in got


def test_minhash_lsh_recovers_exact_dups(dup_docs):
    sigs = dedup.minhash_signatures(dup_docs, n=3, k=8)
    rows = {r["doc_id"]: [r[f"mh_{i}"] for i in range(8)]
            for r in sigs.collect()}
    assert rows[0] == rows[1]           # identical shingle sets
    pairs = {(r["doc_a"], r["doc_b"])
             for r in dedup.lsh_pairs(sigs, k=8, bands=4).collect()}
    assert (0, 1) in pairs


def test_simhash_near_pairs(dup_docs):
    sim = dedup.simhash(dup_docs, bits=32)
    vals = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert vals[0] == vals[1]
    # doc 4 is a word-permutation of doc 3 -> identical tf profile
    assert vals[3] == vals[4]
    pairs = dedup.simhash_near_pairs(sim, max_hamming=6).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    assert got[(0, 1)] == 0
    assert got[(3, 4)] == 0
    assert (0, 2) in got  # near dup within a few bits


def test_ann_cosine_topk(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = ann.cosine_topk(emb, [1.0, 0.0, 0.0], k=2,
                          exclude_vec_id=0).collect()
    assert [r["vec_id"] for r in got] == [1, 2]
    assert got[0]["cos_sim"] == pytest.approx(0.9 / (0.81 + 0.01) ** 0.5)


def test_rp_lsh_same_bucket_for_identical_vectors(spark):
    rows = [(i, [float((i * 7 + j) % 5 - 2) for j in range(16)])
            for i in range(20)]
    rows.append((100, rows[0][1]))  # duplicate of vec 0
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    b = ann.rp_lsh_buckets(emb, n_planes=6, dim=16)
    m = {r["vec_id"]: r["bucket"] for r in b.collect()}
    assert m[0] == m[100]
    # vectors repeat with period 5 -> {5,10,15,100} are all identical
    # to vec 0; top-3 must be the lowest-id exact matches at cos=1.0
    got = ann.rp_lsh_topk(emb, rows[0][1], k=3, n_planes=6,
                          exclude_vec_id=0).collect()
    assert [r["vec_id"] for r in got] == [5, 10, 15]
    assert all(r["cos_sim"] == pytest.approx(1.0) for r in got)


def test_knn_join_bucketed(spark):
    rows = [(i, [1.0 + 0.01 * i, 2.0, 3.0, 4.0]) for i in range(6)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = ann.knn_join_bucketed(emb, k=2, n_planes=2, dim=4).collect()
    by_vec = {}
    for r in got:
        by_vec.setdefault(r["vec_id"], []).append(r["neighbor_id"])
    # all vectors nearly parallel -> same bucket; each gets 2 neighbors
    assert all(len(v) == 2 for v in by_vec.values())


def test_ivf_assign_and_topk(spark):
    # three tight clusters around axis directions; pivots seed from
    # vec_ids 0..2 (one per cluster by construction)
    rows = [
        (0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 1.0]),
        (3, [0.9, 0.1, 0.0]), (4, [0.1, 0.9, 0.0]),
        (5, [0.0, 0.1, 0.9]), (6, [0.95, 0.05, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pivots = ann.ivf_pivots(df, n_cells=3)
    assert [c for c, _ in pivots] == [0, 1, 2]
    cells = {r["vec_id"]: r["cell"]
             for r in ann.ivf_assign(df, pivots).collect()}
    assert cells == {0: 0, 1: 1, 2: 2, 3: 0, 4: 1, 5: 2, 6: 0}
    # probing 1 cell around the x-axis query returns only cluster 0,
    # ordered by exact cosine
    out = ann.ivf_topk(df, [1.0, 0.0, 0.0], k=5, n_cells=3, nprobe=1)
    got = [r["vec_id"] for r in out.collect()]
    assert got == [0, 6, 3]
    # nprobe=3 == brute force over everything
    full = ann.ivf_topk(df, [1.0, 0.0, 0.0], k=7, n_cells=3, nprobe=3)
    brute = ann.cosine_topk(df, [1.0, 0.0, 0.0], k=7)
    assert [r["vec_id"] for r in full.collect()] == [
        r["vec_id"] for r in brute.collect()
    ]


def test_ivf_assign_tie_prefers_smallest_cell(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    pivots = ann.ivf_pivots(df, n_cells=3)
    cells = {r["vec_id"]: r["cell"]
             for r in ann.ivf_assign(df, pivots).collect()}
    assert set(cells.values()) == {0}


def test_ivf_lloyd_refinement_moves_pivots(spark):
    # two clusters; seeds both land in cluster A (vec_ids 0,1) — one
    # Lloyd pass must pull a pivot toward cluster B's mean, and empty
    # cells keep their previous pivot
    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]),
        (2, [0.0, 1.0]), (3, [0.1, 0.9]), (4, [0.05, 0.95]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    seeded = ann.ivf_pivots(df, n_cells=2, refine_iters=0)
    refined = ann.ivf_pivots(df, n_cells=2, refine_iters=2)
    assert seeded != refined
    cells = {r["vec_id"]: r["cell"]
             for r in ann.ivf_assign(df, refined).collect()}
    # after refinement the B cluster is a cell of its own
    assert cells[2] == cells[3] == cells[4]
    assert cells[0] != cells[2]


def test_ngram_contamination_goldens(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),          # contains probe 3-gram "b c d"
            (1, "x y z w v"),          # clean
            (2, "q b c d r"),          # the probe 3-gram mid-document
            (3, "b c"),                # shorter than n -> 0 shingles
            (4, "b c d b c d e"),      # shingles are DISTINCT per doc
        ],
        ["doc_id", "text"],
    )
    probes = spark.createDataFrame(
        [("the probe says b c d here",)], ["text"]
    )
    got = {r["doc_id"]: r
           for r in dedup.ngram_contamination(docs, probes, n=3)
           .collect()}
    assert len(got) == 5  # every corpus doc reported, clean or not
    assert got[0]["contaminated"] and got[0]["n_contaminated"] == 1
    assert not got[1]["contaminated"] and got[1]["n_contaminated"] == 0
    assert got[2]["contaminated"]
    assert got[3]["n_shingles"] == 0 and not got[3]["contaminated"]
    # doc 4 has "b c d" twice but distinct shingles count it once;
    # "c d b"/"d b c"/"c d e" don't appear in the probe; "b c d e"
    # 3-grams of the probe: {the probe says, probe says b, says b c,
    # b c d, c d here} -> only "b c d" hits
    assert got[4]["n_contaminated"] == 1


def test_ngram_contamination_plan_broadcasts_probes(spark):
    """Scale contract: the probe shingle set BROADCASTS (the corpus
    side must not shuffle into a sort-merge join), and the corpus
    shingle scan appears ONCE in the plan (single-pass hit+count
    aggregate)."""
    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(10)], ["doc_id", "text"]
    )
    probes = spark.createDataFrame([("b c d",)], ["text"])
    out = dedup.ngram_contamination(docs, probes, n=3)
    s = out._jdf.queryExecution().executedPlan().toString()
    # the SHINGLE join must be broadcast (a sort-merge there would
    # shuffle every corpus shingle); the final doc_id assembly join
    # may sort-merge — only (doc_id, counts) rows move through it
    assert "BroadcastHashJoin [shingle" in s
    assert "SortMergeJoin [shingle" not in s
    # single corpus shingle pass: the shingle UDF runs once per side
    # (corpus + probes), not twice over the corpus
    assert s.count("Generate explode(__sh") == 2
    # ... and exactly once per ROW: a size() filter under the
    # projection used to make Catalyst evaluate the UDF twice
    assert s.count("ArrowEvalPython") == 2


def test_top_tfidf_terms_plan_pushes_rank_limit(spark):
    """The per-doc top-k rank bound must push pre-shuffle
    (WindowGroupLimit), so only k rows per doc survive the window
    exchange."""
    docs = spark.createDataFrame(
        [(i, "a b c d e f g") for i in range(10)], ["doc_id", "text"]
    )
    out = textfn.top_tfidf_terms(docs, k=2)
    s = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in s


def test_token_stats_formulas(spark):
    df = spark.createDataFrame(
        [(0, "the the quick fox"), (1, "aa bb cc dd")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in textfn.token_stats(df).collect()}
    r0 = got[0]
    assert r0["n_tokens"] == 4 and r0["n_distinct"] == 3
    assert r0["ttr"] == pytest.approx(0.75)
    assert r0["stopword_ratio"] == pytest.approx(0.5)  # "the" twice
    assert r0["avg_token_len"] == pytest.approx((3 + 3 + 5 + 3) / 4)
    r1 = got[1]
    assert r1["ttr"] == 1.0 and r1["stopword_ratio"] == 0.0
    assert r1["quality"] == pytest.approx(1.0 * 1.0 * 4 / 256)


def test_token_count_estimates_goldens(spark):
    rows = [
        (0, "it's a test"),          # contraction -> 4 bpe, 3 ws
        (1, "12345 cats"),           # digit runs cap at 3 -> 123|45|cats
        (2, "don't stop—now!!"),     # punct runs; em-dash is 3 bytes
        (3, ""),                     # empty -> zeros, NULL ratio
        (4, "日本語 テスト 123456789"),  # unicode letters + digit groups
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r
           for r in textfn.token_count_estimates(df).collect()}
    assert (got[0]["bpe_ish_tokens"], got[0]["ws_tokens"]) == (4, 3)
    assert (got[1]["bpe_ish_tokens"], got[1]["ws_tokens"]) == (3, 2)
    assert (got[2]["bpe_ish_tokens"], got[2]["ws_tokens"]) == (6, 2)
    assert got[3]["bpe_ish_tokens"] == 0 and got[3]["ws_tokens"] == 0
    assert got[3]["bytes_per_token"] is None
    assert (got[4]["bpe_ish_tokens"], got[4]["ws_tokens"]) == (5, 3)
    assert got[0]["n_bytes"] == 11
    assert got[0]["bytes_per_token"] == pytest.approx(11 / 4)


def test_token_counts_edge_whitespace(spark):
    """Leading/trailing newlines and vertical tabs must not create
    phantom empty words (split keeps edge empty fields; trim strips
    only spaces), and \\x0b must count as whitespace on both engines
    (WS_CLASS, not the engine-dependent \\s)."""
    rows = [(0, "\nhello world"), (1, "a\x0bb"), (2, "\n\n"),
            (3, "\tx\ty\t"), (4, " spaced out \n")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["ws_tokens"]
           for r in textfn.token_count_estimates(df).collect()}
    assert got == {0: 2, 1: 2, 2: 0, 3: 2, 4: 2}
    qf = {r["doc_id"]: r
          for r in textfn.quality_flags(df).collect()}
    assert qf[0]["n_words"] == 2
    assert qf[2]["n_words"] == 0 and not qf[2]["keep"]


def test_top_tfidf_terms_goldens(spark):
    import math

    docs = spark.createDataFrame(
        [
            (0, "rare common common"),
            (1, "common common other"),
            (2, "common unique"),
        ],
        ["doc_id", "text"],
    )
    got = {}
    for r in textfn.top_tfidf_terms(docs, k=2).collect():
        got.setdefault(r["doc_id"], []).append(r)
    # doc 0: rare (tf1, df1) tfidf=ln(3); common (tf2, df3) tfidf=0
    r0 = sorted(got[0], key=lambda r: r["rank"])
    assert r0[0]["term"] == "rare"
    assert r0[0]["tfidf"] == pytest.approx(math.log(3.0))
    assert r0[1]["term"] == "common" and r0[1]["tfidf"] == 0.0
    # doc 1: other (df1) beats common (df3, tfidf 0)
    r1 = sorted(got[1], key=lambda r: r["rank"])
    assert r1[0]["term"] == "other"
    assert [len(v) for v in got.values()] == [2, 2, 2]


def test_quality_flags_goldens(spark):
    long_good = " ".join(
        ["the", "a", "of"] + [f"word{i}" for i in range(60)]
    )  # 63 words, distinct, 3 stopwords, mean len ~4.9
    repetitive = " ".join(["the", "a"] + ["spam"] * 58)  # top 58/60
    short = "the a tiny one"  # 4 words -> word-count gate fails
    rows = [(0, long_good), (1, repetitive), (2, short), (3, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r
           for r in textfn.quality_flags(df).collect()}
    r0 = got[0]
    assert r0["n_words"] == 63 and r0["keep"]
    assert r0["ok_word_count"] and r0["ok_mean_word_len"]
    assert r0["ok_alpha"] and r0["ok_stop"] and r0["ok_repetition"]
    assert r0["top_word_ratio"] == pytest.approx(1 / 63)
    r1 = got[1]
    assert not r1["ok_repetition"] and not r1["keep"]
    assert r1["top_word_ratio"] == pytest.approx(58 / 60)
    r2 = got[2]
    assert not r2["ok_word_count"] and not r2["keep"]
    assert r2["ok_stop"]  # 'the' and 'a' both present
    r3 = got[3]
    assert r3["n_words"] == 0 and not r3["keep"]
    assert r3["mean_word_len"] is None
    assert not r3["ok_alpha"] and not r3["ok_repetition"]


def test_quality_flags_stopwords_case_insensitive(spark):
    """ADVICE r04: capitalized stopwords ('The', 'A' at sentence
    starts) count toward ok_stop — the published Gopher/C4 heuristic
    is case-insensitive on the stopword gate."""
    text = " ".join(["The", "A"] + [f"word{i}" for i in range(60)])
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    r = textfn.quality_flags(df).collect()[0]
    assert r["ok_stop"]  # 'The' + 'A' -> 2 distinct stopwords


def test_ivf_lloyd_spherical_mean_ignores_magnitude(spark):
    """ADVICE r04: refinement averages UNIT vectors (spherical
    k-means), so one high-magnitude member cannot drag the centroid
    direction — and zero vectors are excluded from the mean."""
    rows = [
        (0, [1.0, 0.0]), (1, [0.0, 1.0]),   # seeds, one per cluster
        (2, [1000.0, 1.0]),                  # a whale in cluster A
        (3, [0.0, 2.0]),                     # cluster B
        (4, [0.0, 0.0]),                     # zero vector, no direction
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    refined = ann.ivf_pivots(df, n_cells=2, refine_iters=1)
    piv = dict(refined)
    import math

    def unit(v):
        n = math.hypot(*v)
        return [x / n for x in v]

    # cell B: [0,1] and [0,2] have the SAME unit vector — the mean
    # stays exactly [0,1] regardless of magnitudes (and the zero
    # vector, whichever cell it lands in, is excluded from the mean)
    b = piv[1]
    assert b[0] == pytest.approx(0.0) and b[1] == pytest.approx(1.0)
    # cell A: mean of unit([1,0]) and unit([1000,1]) — the whale
    # contributes DIRECTION only
    ua, ub = unit([1.0, 0.0]), unit([1000.0, 1.0])
    a = piv[0]
    assert a[0] == pytest.approx((ua[0] + ub[0]) / 2)
    assert a[1] == pytest.approx((ua[1] + ub[1]) / 2)


def test_token_count_pattern_matches_duckdb(spark):
    """The Java-regex (Spark) and RE2 (DuckDB) counts must agree on
    the adversarial shapes — the oracle twin depends on it."""
    import duckdb

    texts = ["it's a test", "12345 cats", "héllo wörld",
             "don't stop—now!!", "''s odd", "a1b2", "  ", "",
             "3.14159", "e=mc2", "日本語 テスト 123456789",
             "a'b 'quoted' x''y", "--- ''' !?!",
             # edge/odd whitespace: leading newline, vertical tab
             # (Java \s matches \x0B, RE2's does not — the explicit
             # WS_CLASS must keep both engines identical), tab-framed
             "\nhello world", "a\x0bb", "\tx\ty\t", "\n\n", "\x0b"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["bpe_ish_tokens"]
           for r in textfn.token_count_estimates(df).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "select len(regexp_extract_all(?, ?))",
            [t, textfn.BPE_ISH_PATTERN],
        ).fetchone()[0]
        assert got[i] == want, (t, got[i], want)


def test_fingerprint_deterministic(spark):
    df = spark.createDataFrame([(0, "a b c"), (1, "a b c")],
                               ["doc_id", "text"])
    rows = textfn.fingerprint(df).collect()
    a, b = sorted(rows, key=lambda r: r["doc_id"])
    for c in ("n_tokens", "min_hash", "max_hash", "sum_hash_mod"):
        assert a[c] == b[c]


def test_lang_id_goldens(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog went to the house"),
            (1, "der Hund und die Katze das ist nicht gut"),
            (2, "le chat et le chien est dans la maison"),
            (3, "el perro y el gato es una casa que no"),
            (4, "zzz qqq xxx"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["pred_lang"] for r in textfn.lang_id(df).collect()}
    assert got[0] == "en" and got[1] == "de"
    assert got[2] == "fr" and got[3] == "es"
    assert got[4] == "und"


def test_portable_hash_matches_duckdb(spark):
    import duckdb

    vals = ["abc", "merge", "the quick", ""]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = [r["h"] for r in
           df.select(textfn.portable_hash(F.col("s")).alias("h")).collect()]
    want = [
        duckdb.sql(
            f"SELECT {textfn.portable_hash_sql(repr(v))}"
        ).fetchone()[0]
        for v in vals
    ]
    assert got == want

def test_embedding_near_dup_pairs(spark):
    from lucene_clj_spark.functions import ann

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = ann.embedding_near_dup_pairs(emb, threshold=0.3, n_planes=3)
    rows = pairs.collect()
    assert all(r["vec_a"] < r["vec_b"] for r in rows)
    assert all(r["cos_sim"] >= 0.3 for r in rows)
    # deterministic: same buckets/planes on a second run
    again = ann.embedding_near_dup_pairs(emb, threshold=0.3, n_planes=3)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
