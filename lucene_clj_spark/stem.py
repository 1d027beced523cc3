"""Porter stemmer — M.F. Porter, "An algorithm for suffix stripping",
Program 14(3) 1980 (the classic public algorithm; Lucene's
PorterStemFilter implements the same paper). Drives the ``english``
analyzer kind (analysis.py), which mirrors Lucene EnglishAnalyzer's
pipeline: StandardTokenizer -> lowercase -> possessive strip ('s) ->
stop filter (ENGLISH_STOP_WORDS) -> PorterStemFilter.

Per-token Python, but applied through a process-wide memo over the
VOCABULARY (web-text batches repeat tokens heavily), so the amortized
cost per posting is a dict hit — the same unique-token trick the
dictionary-encoding build kernel exploits.
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in the [C](VC)^m[V] decomposition."""
    m = 0
    i, n = 0, len(w)
    while i < n and _is_cons(w, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(w, i):
            i += 1
        if i == n:
            break
        m += 1
        while i < n and _is_cons(w, i):
            i += 1
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2
        and w[-1] == w[-2]
        and _is_cons(w, len(w) - 1)
    )


def _cvc(w: str) -> bool:
    """*o: ends consonant-vowel-consonant, final not w/x/y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _repl(w: str, suf: str, rep: str, min_m: int) -> str | None:
    """w with ``suf`` replaced by ``rep`` if the STEM's measure is >
    min_m, else None (no match / condition failed)."""
    if not w.endswith(suf):
        return None
    stem = w[: len(w) - len(suf)]
    if _measure(stem) > min_m:
        return stem + rep
    return w  # suffix matched but condition failed: stop scanning


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
    ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
    ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
    "ize",
]


def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            w = _repl(w, suf, rep, 0) or w
            break
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            w = _repl(w, suf, rep, 0) or w
            break
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and (not stem or stem[-1] not in "st"):
                break
            if _measure(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _ends_double_cons(w) and w[-1] == "l" and _measure(w) > 1:
        w = w[:-1]
    return w


_MEMO: dict[str, str] = {}


def stem_token(w: str) -> str:
    """Memoized porter_stem — the vocabulary is tiny next to the
    postings, so the dict converges to vocab size per worker."""
    s = _MEMO.get(w)
    if s is None:
        s = porter_stem(w)
        _MEMO[w] = s
    return s
