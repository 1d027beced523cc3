"""Edit-distance metrics for fuzzy matching.

Lucene's FuzzyQuery measures Damerau-Levenshtein distance — an adjacent
transposition ("ab" -> "ba") counts as ONE edit, where plain Levenshtein
counts two (reference query.clj:126-147; SURVEY §7 hard-part 6).  This
module implements the true (unrestricted) Damerau-Levenshtein metric of
Lowrance & Wagner, which is also exactly what DuckDB's
``damerau_levenshtein`` computes, so the oracle twin is expressible 1:1
in SQL.  (The common "restricted" variant, OSA, differs only on
contrived cases like "ca" -> "abc" — OSA 3 vs DL 2.)

Used driver-side and inside Arrow-batched pandas UDFs for candidate
expansion over the term dictionary; query terms are short, so the
O(|a|*|b|) DP is trivially cheap per pair.
"""

from __future__ import annotations


def damerau_levenshtein(a: str, b: str) -> int:
    """True Damerau-Levenshtein distance (Lowrance-Wagner DP with the
    last-occurrence table), matching DuckDB's damerau_levenshtein."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    # (la+2) x (lb+2) DP matrix with the sentinel border row/col
    d = [[maxdist] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    da: dict[str, int] = {}
    for i in range(1, la + 1):
        db = 0
        ai = a[i - 1]
        for j in range(1, lb + 1):
            bj = b[j - 1]
            k = da.get(bj, 0)
            l = db
            if ai == bj:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,            # substitute / match
                d[i + 1][j] + 1,           # insert
                d[i][j + 1] + 1,           # delete
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transpose
            )
        da[ai] = i
    return d[la + 1][lb + 1]


def bounded_distance(a: str, b: str, max_edits: int) -> int:
    """Distance with a cheap length-difference short-circuit; returns
    ``max_edits + 1`` when the bound provably cannot be met."""
    if abs(len(a) - len(b)) > max_edits:
        return max_edits + 1
    return damerau_levenshtein(a, b)
