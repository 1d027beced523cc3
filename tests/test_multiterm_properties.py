"""Property pins for the multi-term primitives (hypothesis):

- ``_sloppy_freq_py`` (the SloppyPhraseScorer greedy): slop-0
  equivalence with exact co-location counting, monotonicity in slop,
  and the match-count bound.
- ``_regex_literal_prefix``: every string the anchored pattern accepts
  must start with the extracted prefix (the pruning-safety contract —
  a wrong prefix silently drops true matches at scale).
- ``_wildcard_like``: the LIKE translation agrees with a reference
  wildcard matcher under a real SQL LIKE evaluator (DuckDB, same
  default backslash-escape semantics as Spark's ``Column.like``).
"""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_clj_spark.search import (
    _regex_literal_prefix,
    _sloppy_freq_py,
    _wildcard_like,
)

pos_list = st.lists(
    st.integers(min_value=0, max_value=40), min_size=1, max_size=8
).map(lambda xs: np.sort(np.unique(np.asarray(xs, dtype=np.int64))))


@given(pos_list, pos_list)
@settings(max_examples=200, deadline=None)
def test_sloppy_slop0_counts_colocations(a, b):
    # slop 0: each offset-adjusted co-location is one exact match of
    # weight 1/(1+0); the greedy must count exactly |A ∩ B|
    freq = _sloppy_freq_py([a, b], 0)
    assert freq == len(np.intersect1d(a, b))


@given(pos_list, pos_list, st.integers(0, 5))
@settings(max_examples=200, deadline=None)
def test_sloppy_monotone_and_bounded(a, b, slop):
    f1 = _sloppy_freq_py([a, b], slop)
    f2 = _sloppy_freq_py([a, b], slop + 1)
    assert f2 >= f1 >= 0.0
    # a match is banked per advance of the minimum list plus the final
    # pending one, each weighing <= 1 — Lucene's greedy deliberately
    # counts OVERLAPPING windows sharing occurrences (e.g. A=[0,1],
    # B=[0] banks 1.0 + 0.5 at slop>=1), so min(|A|,|B|) is NOT a
    # bound; the advance count is
    assert f1 <= len(a) + len(b) - 1


@given(pos_list, pos_list, pos_list)
@settings(max_examples=100, deadline=None)
def test_sloppy_three_slots_bounded(a, b, c):
    f = _sloppy_freq_py([a, b, c], 3)
    assert 0.0 <= f <= len(a) + len(b) + len(c) - 2


# --- regex literal prefix: pruning safety ---------------------------------

_ATOMS = ["a", "b", "c", ".", "a*", "b?", "(a|b)", "[ab]", "a|b", "c+"]


@st.composite
def regex_pattern(draw):
    parts = draw(st.lists(st.sampled_from(_ATOMS), min_size=1,
                          max_size=4))
    return "".join(parts)


_CANDS = [""]
for _ in range(5):
    _CANDS = _CANDS + [s + ch for s in _CANDS[-243:] for ch in "abc"]


@given(regex_pattern())
@settings(max_examples=300, deadline=None)
def test_regex_prefix_never_excludes_a_match(pat):
    try:
        rx = re.compile(f"^(?:{pat})$")
    except re.error:
        return
    prefix = _regex_literal_prefix(pat)
    for s in _CANDS:
        if rx.fullmatch(s):
            assert s.startswith(prefix), (pat, prefix, s)


# --- wildcard -> LIKE translation vs a reference matcher -------------------

def _wild_match(pattern: str, s: str) -> bool:
    # reference semantics: * = any run, ? = one char, \x = literal x
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        out.append(".*" if ch == "*" else "." if ch == "?"
                   else re.escape(ch))
        i += 1
    return re.fullmatch("".join(out), s, flags=re.DOTALL) is not None


wild_pattern = st.text(alphabet="ab%_*?\\", min_size=0, max_size=6)
subject = st.text(alphabet="ab%_*?", min_size=0, max_size=6)


@given(wild_pattern, subject)
@settings(max_examples=300, deadline=None)
def test_wildcard_like_matches_reference(pattern, s):
    import duckdb

    like = _wildcard_like(pattern)
    got = duckdb.sql(
        "SELECT ? LIKE ? ESCAPE '\\'", params=[s, like]
    ).fetchone()[0]
    assert bool(got) == _wild_match(pattern, s), (pattern, like, s)
