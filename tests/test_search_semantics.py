"""Semantic end-to-end golden tests — mirror of reference
lucene_test.clj (SURVEY.md §5 level 1): same corpus, same queries, same
expected hit sets."""

import pytest

from tests.conftest import name_pairs, names


def search(index, q, **opts):
    return index.search(q, **opts)


# --- basic-search (lucene_test.clj:46-61) ------------------------------

def test_term_by_first_name(sample_index):
    got = name_pairs(search(sample_index, "shikari", field_name="first_name"))
    assert got == [("Shikari", "Shambhu")]


def test_term_by_last_name_case_insensitive(sample_index):
    got = name_pairs(search(sample_index, "Jupiterwala", field_name="last_name"))
    assert got == [("Sabu", "Jupiterwala")]


def test_map_query_no_opts(sample_index):
    got = name_pairs(search(sample_index, {"last_name": "Jupiterwala"}))
    assert got == [("Sabu", "Jupiterwala")]


# --- phrase-search (lucene_test.clj:63-72) -----------------------------

def test_phrase_then_some_more(sample_index):
    got = name_pairs(search(sample_index, "then some more", field_name="bio"))
    assert got == [("Chacha", "Chaudhary")]


def test_phrase_love_him(sample_index):
    got = name_pairs(search(sample_index, "love him", field_name="bio"))
    assert sorted(got) == [("Sabu", "Jupiterwala"), ("Shikari", "Shambhu")]


# --- or-search-with-set (lucene_test.clj:99-105) -----------------------

def test_or_set(sample_index):
    got = name_pairs(
        search(sample_index, {"Shambhu", "Jupiterwala"}, field_name="last_name")
    )
    assert sorted(got) == [("Sabu", "Jupiterwala"), ("Shikari", "Shambhu")]


# --- search-with-map-multi-fields (lucene_test.clj:107-117) ------------

def test_map_single_field_two_hits(sample_index):
    got = name_pairs(search(sample_index, {"first_name": "Oliver"}))
    assert sorted(got) == [("Oliver", "Hardy"), ("Oliver", "Twist")]


def test_map_multi_field_and(sample_index):
    got = search(sample_index, {"first_name": "Oliver", "real": "true"})
    rows = got.collect()
    assert [(r["first_name"], r["last_name"], r["real"]) for r in rows] == [
        ("Oliver", "Hardy", "True")
    ]


# --- vector = AND within a field (query.clj:54-56) ---------------------

def test_vector_and_within_field(sample_index):
    got = name_pairs(search(sample_index, ["love", "antics"], field_name="bio"))
    # bios containing both: Wonder Woman, Clark Kent
    assert sorted(got) == [("Clark", "Kent"), ("Wonder", "Woman")]


# --- keyword exact (age is :keyword) -----------------------------------

def test_keyword_exact(sample_index):
    got = name_pairs(search(sample_index, {"age": "128"}))
    assert sorted(got) == [
        ("Charlie", "Chaplin"), ("Oliver", "Hardy"), ("Stanley", "Laurel"),
    ]


# --- pagination (lucene_test.clj:137-167) ------------------------------

def test_page_pagination_disjoint(sample_index):
    q = {"bio": {"love", "enjoy"}}
    pages = [
        search(sample_index, q, page=p, results_per_page=2).collect()
        for p in range(3)
    ]
    assert all(len(p) == 2 for p in pages)
    doc_ids = {r["doc_id"] for p in pages for r in p}
    assert len(doc_ids) == 6


def test_search_after_pagination(sample_index):
    q = {"bio": {"love", "enjoy"}}
    page0 = search(sample_index, q, results_per_page=2).collect()
    page1 = search(
        sample_index, q, results_per_page=2, search_after=page0[-1]
    ).collect()
    page2 = search(
        sample_index, q, results_per_page=2, search_after=page1[-1]
    ).collect()
    assert len(page0) == len(page1) == len(page2) == 2
    ids = {r["doc_id"] for p in (page0, page1, page2) for r in p}
    assert len(ids) == 6
    # strictly descending (score, -doc_id) across the concatenation
    seq = [(r["score"], -r["doc_id"]) for p in (page0, page1, page2) for r in p]
    assert seq == sorted(seq, reverse=True)


# --- fuzzy search (README.org:803-832: "forever" matches "Fever") ------

def test_fuzzy_first_name(sample_index):
    got = name_pairs(
        search(sample_index, {"first_name": "Shikaru"}, fuzzy=True)
    )
    assert ("Shikari", "Shambhu") in got


def test_fuzzy_transposition_counts_one_edit(sample_index):
    """Lucene FuzzyQuery measures Damerau-Levenshtein: 'shikrai' is ONE
    transposition from 'shikari' (plain Levenshtein says 2), so it must
    match at max_edits=1 (VERDICT r01 missing-item 2)."""
    from lucene_clj_spark.query import FuzzyQ

    got = search(
        sample_index, FuzzyQ(1.0, "first_name", "shikrai", max_edits=1)
    )
    assert "Shikari" in names(got)


def test_fuzzy_double_transposition(sample_index):
    """'hsikrai' = two transpositions from 'shikari' (Levenshtein 4):
    matches at the default max_edits=2 only under Damerau."""
    got = search(sample_index, {"first_name": "hsikrai"}, fuzzy=True)
    assert "Shikari" in names(got)


def test_damerau_levenshtein_metric():
    from lucene_clj_spark.fuzzy import bounded_distance, damerau_levenshtein

    assert damerau_levenshtein("mereg", "merge") == 1   # transposition
    assert damerau_levenshtein("merge", "merge") == 0
    assert damerau_levenshtein("merg", "merge") == 1
    assert damerau_levenshtein("ab", "ba") == 1
    # true DL (Lowrance-Wagner), not OSA: edit inside a transposed pair
    assert damerau_levenshtein("ca", "abc") == 2
    assert damerau_levenshtein("", "abc") == 3
    assert bounded_distance("a", "abcd", 2) == 3  # short-circuit


def test_damerau_levenshtein_matches_duckdb():
    """Parity pin: the engine's metric is exactly DuckDB's
    damerau_levenshtein (the oracle twin)."""
    import itertools
    import random

    import duckdb

    from lucene_clj_spark.fuzzy import damerau_levenshtein

    con = duckdb.connect()
    rng = random.Random(42)
    words = ["".join(rng.choice("abc") for _ in range(rng.randint(0, 6)))
             for _ in range(40)]
    for a, b in itertools.islice(itertools.combinations(words, 2), 400):
        want = con.sql(
            "SELECT damerau_levenshtein(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert damerau_levenshtein(a, b) == want, (a, b)


def test_fuzzy_rejects_typed_field(sample_index):
    from lucene_clj_spark.errors import ValueTypeError

    # age is keyword -> allowed; synthesize a long field rejection via
    # a fresh spec check
    from lucene_clj_spark.query import combine_fuzzy
    from lucene_clj_spark.schema import normalize_field_specs

    specs = normalize_field_specs({"year": "long"})
    with pytest.raises(ValueTypeError):
        combine_fuzzy({"year": "199"}, specs)


# --- ordering & scores -------------------------------------------------

def test_hit_fn_arbitrary_projection(sample_index):
    """The reference's arbitrary hit->doc callable (search.clj:49-54):
    any Python fn over the stored doc, Arrow-batched over the top-k."""
    got = search(
        sample_index,
        "shikari",
        field_name="first_name",
        hit_fn=lambda d: {
            "full_name": f"{d['first_name']} {d['last_name']}",
            "bio_len": len(d["bio"]),
        },
        hit_fn_schema="full_name string, bio_len long",
    ).collect()
    assert [r["full_name"] for r in got] == ["Shikari Shambhu"]
    assert got[0]["bio_len"] == len(
        "Carries a gun. But no bullets. Animals love him."
    )
    assert got[0]["score"] > 0


def test_hit_fn_requires_schema(sample_index):
    from lucene_clj_spark.errors import ValidationError

    with pytest.raises(ValidationError):
        search(sample_index, "shikari", field_name="first_name",
               hit_fn=lambda d: d).collect()
    # hit_fn without stored docs is a contradiction -> explicit error
    with pytest.raises(ValidationError):
        search(sample_index, "shikari", field_name="first_name",
               hit_fn=lambda d: d, hit_fn_schema="x string",
               with_hit=False).collect()


def test_results_ordered_by_score_then_docid(sample_index):
    got = search(sample_index, {"bio": {"love", "enjoy", "antics"}}).collect()
    seq = [(r["score"], -r["doc_id"]) for r in got]
    assert seq == sorted(seq, reverse=True)
    assert all(r["score"] > 0 for r in got)


def test_top_k_default_10(sample_index):
    got = search(sample_index, {"gender": "m"}).collect()
    assert len(got) == 10  # 11 matches, default results_per_page=10


# --- validation contracts (mirror contract_test.clj:28-51) -------------

def test_string_query_without_field_raises(sample_index):
    from lucene_clj_spark.errors import ValidationError

    with pytest.raises(ValidationError):
        search(sample_index, "shikari").collect()


def test_bad_results_per_page(sample_index):
    from lucene_clj_spark.errors import ValidationError

    with pytest.raises(ValidationError):
        search(sample_index, {"bio": "love"}, results_per_page=0)


def test_page_and_search_after_exclusive(sample_index):
    from lucene_clj_spark.errors import ValidationError

    with pytest.raises(ValidationError):
        search(
            sample_index, {"bio": "love"}, page=1,
            search_after={"doc_id": 1, "score": 1.0},
        )


def test_named_enum_query(sample_index):
    """Q6: keyword/symbol (Named) query forms are treated as their
    string name (reference query.clj:79-81)."""
    import enum

    class Q(enum.Enum):
        Scarlett = "ignored"

    got = sample_index.search(Q.Scarlett, field_name="first_name")
    want = sample_index.search("Scarlett", field_name="first_name")
    assert [r["doc_id"] for r in got.collect()] == [
        r["doc_id"] for r in want.collect()
    ]
