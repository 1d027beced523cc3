"""Analyzers — StandardAnalyzer-equivalent tokenization as vectorized UDFs.

Mirrors the reference's analyzer constructors (reference
analyzers.clj:10-26):

- ``standard``: UAX#29 word-break tokenization + lowercase + stop-filter.
  NOTE: the reference's 0-arg convenience passes an EMPTY stop set
  (``(standard-analyzer [] true)``, analyzers.clj:16), so the default
  removes NO stopwords — we match that.
- ``simple``: split at non-letters, lowercase (analyzers.clj:10).
- ``keyword``: whole input is one verbatim token (analyzers.clj:12).
- ``whitespace``: split on whitespace (Lucene WhitespaceAnalyzer).
- per-field registry with a default (analyzers.clj:22-26).

The same analyzer MUST run at index and query time (reference
README.org:250); `Analyzer.tokens()` is the single code path used by
both the index-build Arrow UDF and the driver-side query compiler, so
the invariant holds by construction.

UAX#29 subset implemented (the rules StandardTokenizer exercises on
web text):
- WB5/8/9/10: runs of letters+digits form one token ("abc123").
- WB6/7:   MidLetter/MidNumLet/single-quote between letters joins
           ("can't", "a.b", "wi:fi" stay single tokens).
- WB11/12: MidNum/MidNumLet between digits joins ("3.14", "1,000").
- Han & Hiragana ideographs emit one token per character; Katakana
  emits runs (StandardTokenizer's CJK behavior).
- Underscore is NOT a word character (splits), matching UAX#29.
- Tokens longer than ``max_token_length`` (default 255, Lucene's
  StandardAnalyzer default) are split into chunks of that length.

Everything is vectorized at the Arrow-batch level (pandas ``.str``
kernels inside ``pandas_udf``) — no row-at-a-time Python UDFs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_MAX_TOKEN_LENGTH = 255

# English stop set (Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET) —
# available but NOT default, matching reference analyzers.clj:16.
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)

# --- character classes -------------------------------------------------
# Han (CJK Unified Ideographs + ext A) and Hiragana: one token per char.
_CJK_SINGLE = r"一-鿿㐀-䶿豈-﫿぀-ゟ"
_KATAKANA = r"゠-ヿㇰ-ㇿ"
# Word chars: unicode alnum minus underscore minus the CJK singles above.
_W = rf"[^\W_{_CJK_SINGLE}{_KATAKANA}]"
# MidLetter + MidNumLet + single/typographic quote (UAX#29 WB6/7/11/12).
_MID = r"['’\.··‧:,;՟״︓﹕："
_MID += r"٬⁄︐︔，；]"

_STANDARD_PATTERN = re.compile(
    rf"(?:{_W}(?:{_MID}?{_W})*)"          # word run with single mid-joiners
    rf"|[{_CJK_SINGLE}]"                   # one token per Han/Hiragana char
    rf"|[{_KATAKANA}]+",                   # katakana runs
    re.UNICODE,
)
# Strict post-filter: a mid char may only sit BETWEEN word chars and
# never doubled; the regex above already guarantees that via `_MID?_W`.
# But commas/periods between letters vs digits differ in UAX#29:
# MidNum (",", ";") joins only digits. Fix-up pass below.
_LETTER_COMMA_SPLIT = re.compile(r"(?<=[^\W\d_])[,;，；](?=[^\W\d_])", re.UNICODE)

_SIMPLE_PATTERN = re.compile(r"[^\W\d_]+", re.UNICODE)


def _chunk(tok: str, max_len: int) -> Iterator[str]:
    if len(tok) <= max_len:
        yield tok
    else:
        for i in range(0, len(tok), max_len):
            yield tok[i : i + max_len]


def _standard_tokens(
    text: str, stop_words: frozenset[str], max_len: int
) -> list[str]:
    if not text:
        return []
    out: list[str] = []
    for raw in _STANDARD_PATTERN.findall(text.lower()):
        # MidNum chars (",",";") only join digit-digit: re-split runs where
        # a comma/semicolon landed between letters.
        for part in _LETTER_COMMA_SPLIT.split(raw):
            part = part.strip("'’.·:,;")  # no leading/trailing mids
            if not part or part in stop_words:
                continue
            out.extend(_chunk(part, max_len))
    return out


def _simple_tokens(text: str, _stop: frozenset[str], max_len: int) -> list[str]:
    if not text:
        return []
    out: list[str] = []
    for tok in _SIMPLE_PATTERN.findall(text.lower()):
        out.extend(_chunk(tok, max_len))
    return out


def _whitespace_tokens(text: str, _stop: frozenset[str], _ml: int) -> list[str]:
    return text.split() if text else []


def _keyword_tokens(text: str, _stop: frozenset[str], _ml: int) -> list[str]:
    return [text] if text is not None else []


def _english_tokens(
    text: str, stop_words: frozenset[str], max_len: int
) -> list[str]:
    """Lucene EnglishAnalyzer pipeline: StandardTokenizer + lowercase
    (shared _standard_tokens), EnglishPossessiveFilter (strip a
    trailing 's — the tokenizer keeps "node's" whole via the
    mid-letter apostrophe rule), StopFilter, PorterStemFilter
    (stem.py, memoized over the vocabulary)."""
    from lucene_clj_spark.stem import stem_token

    out = []
    for t in _standard_tokens(text, frozenset(), max_len):
        if t.endswith("'s") or t.endswith("\u2019s"):
            t = t[:-2]
            if not t:
                continue
        if t in stop_words:
            continue
        out.append(stem_token(t))
    return out


@dataclass(frozen=True)
class Analyzer:
    """A named tokenization pipeline usable on both sides of the index.

    ``kind`` in {standard, simple, whitespace, keyword, english};
    ``stop_words`` applies to standard/english (standard defaults
    EMPTY, matching reference analyzers.clj:16; english defaults to
    ENGLISH_STOP_WORDS like Lucene's EnglishAnalyzer() — pass an
    explicit set to override).
    """

    kind: str = "standard"
    #: None (the default) = the KIND's default stop set — empty for
    #: standard (reference analyzers.clj:16), ENGLISH_STOP_WORDS for
    #: english (Lucene EnglishAnalyzer()). An EXPLICIT set — including
    #: an explicit empty one — is honored verbatim, so
    #: Analyzer("english", stop_words=frozenset()) stems WITHOUT stop
    #: removal (Lucene's EnglishAnalyzer(CharArraySet.EMPTY_SET)).
    stop_words: frozenset[str] | None = None
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH

    def __post_init__(self):
        if self.stop_words is None:
            object.__setattr__(
                self,
                "stop_words",
                ENGLISH_STOP_WORDS if self.kind == "english"
                else frozenset(),
            )
        elif not isinstance(self.stop_words, frozenset):
            object.__setattr__(
                self, "stop_words", frozenset(self.stop_words)
            )

    def _fn(self) -> Callable[[str, frozenset[str], int], list[str]]:
        try:
            return {
                "standard": _standard_tokens,
                "simple": _simple_tokens,
                "whitespace": _whitespace_tokens,
                "keyword": _keyword_tokens,
                "english": _english_tokens,
            }[self.kind]
        except KeyError:
            raise ValueError(f"unknown analyzer kind: {self.kind!r}") from None

    def tokens(self, text: str | None) -> list[str]:
        """Driver-side analysis (query strings, tests)."""
        if text is None:
            return []
        return self._fn()(text, self.stop_words, self.max_token_length)

    def tokens_arrow_fast(self, arr):
        """Arrow-native tokenization fast path: returns
        ``(flat_tokens, lens)`` — a pyarrow StringArray of every row's
        non-empty tokens concatenated, plus per-row token counts — or
        ``None`` when any row needs the full UAX#29 path.

        Same acceptance guard as the pandas fast path in
        :meth:`tokens_series` (standard analyzer, empty stop set,
        default token cap, rows of pure ``[a-z0-9 ]`` with no >255
        alnum run), and BYTE-IDENTICAL output on the rows it accepts —
        pinned by tests/test_arrow_kernel.py and
        tests/test_analysis.py. The win: split + empty-drop +
        (downstream) dictionary-encode all run in Arrow C++ with zero
        per-token Python objects, where ``str.split`` materializes a
        Python list per row.
        """
        if (self.kind != "standard" or self.stop_words
                or self.max_token_length < 255):
            return None
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        n = len(arr)
        if n == 0:
            return pa.array([], type=pa.string()), np.zeros(0, np.int64)
        arr = pc.fill_null(arr, "")
        if arr.type != pa.string():
            arr = arr.cast(pa.string())
        ok = pc.all(pc.and_(
            pc.match_substring_regex(arr, r"^[a-z0-9 ]*$"),
            pc.invert(pc.match_substring_regex(arr, r"[a-z0-9]{256}")),
        )).as_py()
        if not ok:
            return None
        lst = pc.ascii_split_whitespace(arr)
        counts = pc.list_value_length(lst).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = lst.flatten()
        # arrow's split emits empty tokens at boundaries ("a " -> ["a",
        # ""]); python's str.split() drops them — filter + recount
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if nonempty.all():
            return flat, counts
        row_id = np.repeat(np.arange(n, dtype=np.int64), counts)
        lens = np.bincount(row_id[nonempty], minlength=n)
        return flat.filter(pa.array(nonempty)), lens

    def tokens_series(self, s: pd.Series) -> pd.Series:
        """Arrow-batch analysis: pandas Series[str] -> Series[list[str]].

        Per-row fast path: rows that are pure ``[a-z0-9 ]`` (the common
        case for pre-normalized web text) tokenize via the C-speed
        whitespace split — BYTE-IDENTICAL to the UAX#29 path on such
        rows (no mid-joiners/CJK/uppercase present; rows containing a
        >255-char run are excluded so max-token-length chunking still
        applies). All other rows take the full regex path.
        """
        s = s.fillna("")
        if self.kind == "whitespace":
            return s.str.split()
        if self.kind == "keyword":
            return s.apply(lambda x: [x])
        if self.kind == "english":
            # tokenize on the STANDARD path (its [a-z0-9 ] split fast
            # path applies), then run possessive/stop/stem through a
            # per-batch token table — each distinct token pays the
            # pipeline once, every repeat is a dict hit (the same
            # unique-token amortization the build kernel and stem
            # memo use)
            from lucene_clj_spark.stem import stem_token

            base = Analyzer(
                "standard", max_token_length=self.max_token_length
            ).tokens_series(s)
            stop = self.stop_words
            table: dict[str, str | None] = {}

            def _fin(t: str) -> str | None:
                if t.endswith("'s") or t.endswith("’s"):
                    t = t[:-2]
                if not t or t in stop:
                    return None
                return stem_token(t)

            def _row(lst):
                out = []
                for t in lst:
                    if t in table:
                        v = table[t]
                    else:
                        v = table[t] = _fin(t)
                    if v is not None:
                        out.append(v)
                return out

            return base.map(_row)
        fn, stop, ml = self._fn(), self.stop_words, self.max_token_length
        if self.kind == "standard" and not stop and ml >= 255:
            fast = s.str.fullmatch("[a-z0-9 ]*") & ~s.str.contains(
                r"[a-z0-9]{256}", regex=True
            )
            if fast.all():
                return s.str.split()
            out = pd.Series([None] * len(s), index=s.index, dtype=object)
            out[fast] = s[fast].str.split()
            slow = ~fast
            out[slow] = s[slow].map(lambda x: fn(x, stop, ml))
            return out
        return s.map(lambda x: fn(x, stop, ml))

    def udf(self) -> Callable[..., Column]:
        """A vectorized pandas_udf: StringType -> ArrayType(StringType)."""
        from lucene_clj_spark._udfs import analyze_udf

        return analyze_udf(self)

    def column(self, col: Column | str, allow_fast: bool = False) -> Column:
        """Analysis as a Column expression.

        JVM-native (whole-stage-codegen'd, no Python worker) for the
        analyzers whose semantics built-in functions express EXACTLY
        (keyword/whitespace/simple); the standard analyzer uses the
        Arrow UDF, which is token-exact. ``allow_fast=True`` opts the
        standard analyzer into a JVM split on non-alnum runs — a
        documented approximation (loses mid-word apostrophes/"3.14"
        joining and CJK single-char rules) for corpora known to be
        plain ``[a-z0-9 ]`` text.
        """
        c = F.col(col) if isinstance(col, str) else col
        if self.kind == "keyword":
            return F.array(c)
        if self.kind == "whitespace":
            # java String.split-like; drop empty strings like split() does
            return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))
        if self.kind == "simple":
            toks = F.filter(F.split(F.lower(c), r"[^\p{L}]+"), lambda t: t != F.lit(""))
            return toks
        if self.kind == "standard" and not self.stop_words and allow_fast:
            pat = r"[^\p{L}\p{Nd}]+"
            toks = F.filter(F.split(F.lower(c), pat), lambda t: t != F.lit(""))
            return toks
        return self.udf()(c)

    def jvm_exact_for(self, sample: str) -> bool:
        """True if `column()`'s JVM fast path is token-exact for `sample`."""
        if self.kind != "standard" or self.stop_words:
            return True
        return bool(re.fullmatch(r"[a-z0-9 ]*", sample or ""))


STANDARD = Analyzer("standard")
SIMPLE = Analyzer("simple")
WHITESPACE = Analyzer("whitespace")
KEYWORD = Analyzer("keyword")


def standard_analyzer(
    stop_words: frozenset[str] | set[str] | list[str] = frozenset(),
) -> Analyzer:
    """Reference analyzers.clj:14-19 — default stop set is EMPTY."""
    return Analyzer("standard", frozenset(stop_words))


def per_field_analyzer(
    default: Analyzer, per_field: dict[str, Analyzer]
) -> dict[str, Analyzer]:
    """Reference analyzers.clj:22-26 — registry with a default under None."""
    reg = dict(per_field)
    reg[None] = default  # type: ignore[index]
    return reg


def resolve_analyzer(spec, default: Analyzer = STANDARD) -> Analyzer:
    """Accept an Analyzer, a kind string, or None."""
    if spec is None:
        return default
    if isinstance(spec, Analyzer):
        return spec
    if isinstance(spec, str):
        return Analyzer(spec)
    raise ValueError(f"cannot resolve analyzer from {spec!r}")
