"""Shape-driven query compiler — mirror of reference query.clj.

One ``parse`` dispatches on the Python data shape of the query form
(reference query.clj:18-19 protocol over Clojure shapes; cheat-sheet
README.org:834-857). The IR here is a small AST (the analogue of the
reference's Lucene ``Query`` tree); compilation to a scored DataFrame
happens in search.py.

Shape -> semantics (reference loc):
- AST ``Node``           passthrough escape hatch         (query.clj:50-52)
- ``list`` / ``tuple``   AND (BooleanClause MUST)         (query.clj:54-56)
- ``set`` / ``frozenset`` OR (SHOULD)                     (query.clj:58-60)
- ``dict``               AND across fields; the key overrides field_name
                         for its value sub-expression     (query.clj:62-64, 29-37)
- ``str``                typed field -> exact query; else single token ->
                         term query, whitespace -> phrase query (decided
                         by a whitespace regex on the RAW string)
                                                          (query.clj:66-77)
- ``Enum``               treated as its name (Named)      (query.clj:79-81)
- ``int/float/bool/datetime`` typed EXACT query; raises unless the field
                         is declared long/double/boolean/instant
                                                          (query.clj:83-113)
- ``parse_dsl``          classic Lucene QueryParser subset (query.clj:115-124)
- fuzzy map              per-field FuzzyQuery, OR-combined; only
                         text/keyword fields              (query.clj:126-147)

Boolean scoring semantics match Lucene: a BooleanQuery's score is the
SUM of the scores of its matching clauses; MUST clauses are required,
SHOULD clauses optional (contributing score when present) unless there
are no MUSTs, in which case at least one SHOULD must match.
"""

from __future__ import annotations

import datetime as dt
import enum
import re
from dataclasses import dataclass, field as dc_field, replace as dc_replace
from typing import Any

from lucene_clj_spark.errors import ValidationError, ValueTypeError
from lucene_clj_spark.schema import FieldSpec
from lucene_clj_spark.values import (
    normalize_boolean,
    normalize_double,
    normalize_instant,
    normalize_long,
    normalize_text,
)

MUST = "MUST"
SHOULD = "SHOULD"
# Lucene BooleanClause.Occur.FILTER: the clause must match but
# contributes NO score (constant-0, never even computed) — the
# occur Lucene users reach for when a range/term restriction should
# not perturb BM25 ranking
FILTER = "FILTER"

_WS = re.compile(r"\s")


@dataclass(frozen=True)
class Node:
    boost: float = 1.0


@dataclass(frozen=True)
class TermQ(Node):
    field: str = ""
    term: str = ""


@dataclass(frozen=True)
class PhraseQ(Node):
    field: str = ""
    terms: tuple[str, ...] = ()
    # sloppy phrase (``"a b"~N`` in the classic DSL): terms may match
    # within N total positional edits; freq accumulates Lucene's
    # sloppyWeight 1/(1+matchLength) per match. 0 = exact adjacency.
    slop: int = 0


@dataclass(frozen=True)
class ExactQ(Node):
    """Typed exact point/term query (constant-score for point types,
    norm-less BM25 for keyword — reference field_types.clj:166-182)."""

    field: str = ""
    value: Any = None
    value_type: str = "keyword"


@dataclass(frozen=True)
class FuzzyQ(Node):
    field: str = ""
    term: str = ""
    max_edits: int = 2           # FuzzyQuery default (query.clj:126-147)
    prefix_length: int = 0
    max_expansions: int = 50     # Lucene FuzzyQuery.defaultMaxExpansions


@dataclass(frozen=True)
class WildcardQ(Node):
    """Wildcard / prefix multi-term query (``te*t`` / ``te?t`` / ``te*``
    in the classic DSL). Lucene QueryParser builds WildcardQuery /
    PrefixQuery here (reference surface: query.clj:115-124 passes any
    string to QueryParser, whose grammar includes wildcards); both use
    the constant-score rewrite — every matching doc scores ``boost``,
    no BM25 — which is what this engine reproduces. ``pattern`` is
    normalized (lowercased for lowercasing analyzers, like Lucene's
    ``Analyzer.normalize`` wildcard handling); ``*`` matches any run,
    ``?`` exactly one char; ``\\*`` / ``\\?`` escape literals."""

    field: str = ""
    pattern: str = ""


@dataclass(frozen=True)
class RegexpQ(Node):
    """Regexp query (``field:/pattern/`` in the classic DSL — the
    QueryParser regexp production, reachable through the reference's
    parse-dsl at query.clj:115-124). Matches whole terms against the
    anchored pattern, constant-score rewrite like Lucene's
    RegexpQuery. The pattern is NOT analyzer-normalized (Lucene leaves
    regexp terms verbatim); supported syntax is the Java-regex subset
    shared with Lucene RegExp ops (literals, ``.``, ``*``, ``+``,
    ``?``, ``|``, ``(...)``, ``[...]``, ``{n,m}``). ``\\/`` escapes a
    literal slash."""

    field: str = ""
    pattern: str = ""


@dataclass(frozen=True)
class RangeQ(Node):
    """Term / point range query (``[a TO b]`` / ``{a TO b}`` in the
    classic DSL — QueryParser grammar, reachable through the
    reference's parse-dsl at query.clj:115-124). On text/keyword
    fields this is Lucene's TermRangeQuery: constant-score over docs
    containing >=1 term inside the lexicographic range. On typed
    long/double/instant fields it is the point range query (also
    constant-score — same scoring class as the typed exact queries,
    field_types.clj:166-182). ``None`` endpoint = open (``*``)."""

    field: str = ""
    lo: Any = None
    hi: Any = None
    include_lo: bool = True
    include_hi: bool = True
    value_type: str = "text"


@dataclass(frozen=True)
class MatchAll(Node):
    """``*:*`` — Lucene's MatchAllDocsQuery: every doc, score = boost."""

    pass


@dataclass(frozen=True)
class BoolQ(Node):
    clauses: tuple[tuple[str, Node], ...] = ()
    # Lucene BooleanQuery.Builder.setMinimumNumberShouldMatch: at
    # least this many SHOULD clauses must match (0 = Lucene's default:
    # >=1 SHOULD required only when there are no MUST/FILTER clauses).
    # Matched SHOULD clauses always contribute score, msm or not.
    min_should_match: int = 0

    def musts(self) -> list[Node]:
        return [n for occ, n in self.clauses if occ == MUST]

    def shoulds(self) -> list[Node]:
        return [n for occ, n in self.clauses if occ == SHOULD]


@dataclass(frozen=True)
class DisMaxQ(Node):
    """Lucene ``DisjunctionMaxQuery`` — not reachable through the
    reference's parse shapes (query.clj:79-124 builds only boolean /
    term / phrase / typed queries), but part of the Lucene query
    surface every deployment of the reference can hand in PREBUILT
    (query.clj:50-52 passes ``Query`` instances through untouched —
    the same passthrough this engine gives ``Node`` instances). A
    document matches when ANY disjunct matches; its score is the
    maximum matching disjunct score plus ``tie_breaker`` times the sum
    of the other matching disjuncts' scores, scaled by ``boost``
    (DisjunctionMaxQuery's documented formula). Lucene enforces
    ``0 <= tie_breaker <= 1``; so does the compiler."""

    disjuncts: tuple[Node, ...] = ()
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class ConstantScoreQ(Node):
    """Lucene ``ConstantScoreQuery``: wraps any query; every matching
    document scores exactly ``boost``, the inner scores are never
    computed. Prebuilt-only, like :class:`DisMaxQ` — the
    query.clj:50-52 passthrough surface. (The multi-term queries —
    wildcard/regexp/range — already use the constant-score rewrite
    internally; this node exposes the wrapper for arbitrary inner
    queries, e.g. an unscored term restriction that should contribute
    a fixed bonus instead of BM25.)"""

    inner: Node | None = None


@dataclass(frozen=True)
class SpanFirstQ(Node):
    """Lucene ``SpanFirstQuery(SpanTermQuery(field, term), end)`` —
    matches documents where ``term`` occurs at a token position
    strictly below ``end`` (Lucene keeps spans with ``span.end() <=
    end``; a single-term span at position p ends at p+1). Scored like
    Lucene's SpanScorer over BM25: freq = the number of qualifying
    positions (the sloppyFreq of a zero-length single-term span is 1
    per match), idf/df from the term's FULL document frequency (the
    SpanWeight uses the underlying term's statistics), same length
    norm as a term query. Prebuilt-only, like :class:`DisMaxQ` — the
    query.clj:50-52 passthrough surface."""

    field: str = ""
    term: str = ""
    end: int = 1


@dataclass(frozen=True)
class TermInSetQ(Node):
    """Lucene ``TermInSetQuery`` (the successor of ``TermsQuery``) —
    matches documents containing AT LEAST ONE of ``terms`` in
    ``field``, constant-score rewrite: every matching doc scores
    exactly ``boost``, no BM25 (TermInSetQuery extends MultiTermQuery
    with CONSTANT_SCORE_REWRITE). Terms are taken VERBATIM, exactly
    like Lucene's BytesRef terms — no analyzer normalization (the
    caller is expected to pass already-analyzed terms, same contract
    as building the Lucene query from ``new Term(field, text)``).
    Prebuilt-only, like :class:`DisMaxQ` — the query.clj:50-52
    passthrough surface.

    Scale shape: ONE bucket-pruned postings scan with an IN predicate
    (the term set's bucket directories are constant-folded into
    PartitionFilters, and the IN pushes into the parquet reader for
    row-group min/max pruning on the sorted term column), then a
    distinct over the matching doc_ids only — never a per-term scan
    or a driver-side loop, so a 10^4-term set at web scale still
    costs one scan of the touched buckets."""

    field: str = ""
    terms: tuple[str, ...] = ()


@dataclass(frozen=True)
class MultiPhraseQ(Node):
    """Lucene ``MultiPhraseQuery`` — an exact-adjacency phrase where
    each position accepts ANY of a SET of terms (the classic synonym
    phrase: ``(app OR application) store``). ``positions`` is a tuple
    of per-slot term tuples. Matching: a phrase occurrence starts at
    token position p when for every slot i some term of slot i occurs
    at p + i. Scoring follows Lucene's MultiPhraseWeight: freq = the
    number of phrase occurrences (a slot matched by several of its
    alternatives still contributes ONE occurrence — the union of the
    alternatives' position lists is deduplicated), idf = the SUM of
    per-term idfs over every (slot, term) entry (MultiPhraseQuery's
    getTerms() flattens all slots into the Similarity's term
    statistics), BM25 over that freq with the standard quantized
    length norm. Terms are verbatim, like :class:`TermInSetQ`.
    Prebuilt-only — the query.clj:50-52 passthrough surface."""

    field: str = ""
    positions: tuple[tuple[str, ...], ...] = ()


@dataclass(frozen=True)
class SpanNearQ(Node):
    """Lucene ``SpanNearQuery`` over single-term clauses: all ``terms``
    must occur within a covering interval of at most ``slop``
    intervening gaps — ``matchSlop = (interval length) - k <= slop``
    — in clause order when ``in_order`` (NearSpansOrdered) or any
    order otherwise (NearSpansUnordered). Scoring follows the sloppy
    family: freq accumulates ``1/(1 + matchSlop)`` per enumerated
    match (ordered: one minimal-completion match per first-clause
    position; unordered: the sloppy-phrase greedy over unshifted
    positions), idf = sum of per-term idfs, BM25 over the float freq
    with the quantized length norm. Terms are verbatim and must be
    distinct (the repeat-group matcher variant is unsupported, like
    sloppy phrases). Prebuilt-only — the query.clj:50-52 passthrough
    surface.

    vs PhraseQ(slop=N): a sloppy phrase weighs matches by the
    OFFSET-ADJUSTED edit distance (transposed adjacent terms cost 2),
    while span-near only measures the covering interval — ``"a b"``
    appearing as ``b a`` scores 1.0 under unordered span-near (gap 0)
    but 1/3 under slop-2 sloppy phrase."""

    field: str = ""
    terms: tuple[str, ...] = ()
    slop: int = 0
    in_order: bool = True


@dataclass(frozen=True)
class SpanOrQ(Node):
    """Lucene ``SpanOrQuery`` over single-term clauses: matches
    documents containing ANY of ``terms``; the span enumeration is the
    positional union of the clauses. Scoring follows SpanScorer: each
    width-1 span contributes sloppyFreq 1, so freq = the TOTAL
    occurrence count across matching terms (sum of tfs); the
    SpanWeight builds its similarity from every clause term's
    statistics, so idf = the SUM of per-term idfs over the terms
    present in the corpus (df = 0 terms are skipped, matching
    ``IndexSearcher.termStatistics``'s null for absent terms); BM25
    over that freq with the quantized length norm. Terms are verbatim
    and deduplicated. Prebuilt-only — the query.clj:50-52 passthrough
    surface.

    vs BoolQ(SHOULD): an OR of term queries scores each term with ITS
    OWN BM25 (per-term tf saturation) and sums the scores; span-or
    pools the tfs FIRST and saturates once — a doc with 5+5
    occurrences of two synonyms scores like one term with tf 10, not
    like two saturating terms. This is why SpanOrQuery is the classic
    synonym-expansion primitive.

    Scale shape: ONE bucket-pruned postings scan with an IN predicate
    (PartitionFilters + row-group pruning, like :class:`TermInSetQ`)
    feeding a single map-side-combined aggregate — never a per-term
    scan."""

    field: str = ""
    terms: tuple[str, ...] = ()


@dataclass(frozen=True)
class SpanNotQ(Node):
    """Lucene ``SpanNotQuery(include, exclude, pre, post)`` over
    single-term clauses: matches spans of ``include`` that do NOT have
    an ``exclude`` span within ``pre`` positions before or ``post``
    positions after. For width-1 spans an include occurrence at
    position p is rejected iff some exclude occurrence q satisfies
    ``p - pre <= q <= p + post`` (the span-overlap test
    ``E.end > S.start - pre and E.start < S.end + post`` specialized
    to unit spans). Scoring: freq = the count of SURVIVING include
    positions (each a sloppyFreq-1 span); the similarity is built from
    the INCLUDE term's statistics only — the exclude clause gates
    matching but contributes no idf and no df change (Lucene
    SpanNotWeight passes the include weight's term states). BM25 over
    that freq with the quantized length norm, full include-term df.
    Terms are verbatim. Prebuilt-only — the query.clj:50-52
    passthrough surface.

    vs BoolQ(MUST_NOT): boolean NOT drops the whole document when the
    excluded term appears ANYWHERE; span-not only drops the
    co-located occurrences — "apple NOT NEAR pie" still matches a doc
    that mentions apple pie once and plain apple elsewhere, with freq
    reduced accordingly.

    Scale shape: two bucket-pruned single-term postings seeks joined
    on doc_id (LEFT join — docs without the exclude term keep every
    position), position filtering fully JVM-side via higher-order
    array functions; candidates are bounded by the include term's
    df."""

    field: str = ""
    include: str = ""
    exclude: str = ""
    pre: int = 0
    post: int = 0


@dataclass(frozen=True)
class FunctionScoreQ(Node):
    """Lucene ``FunctionScoreQuery`` with a stored-field
    ``DoubleValuesSource`` (``DoubleValuesSource.fromDoubleField`` /
    ``fromLongField``): re-scores the ``inner`` query's match set with
    a per-document value read from stored field ``source_field``.

    ``mode="multiply"`` is ``FunctionScoreQuery.boostByValue`` —
    score = inner_score * value; ``mode="replace"`` is the plain
    ``FunctionScoreQuery(query, source)`` — score = value and the
    inner query contributes its match set only. ``missing`` is the
    value used for documents with a NULL stored value (Lucene's
    ``DoubleValues`` advances to 0 for missing doc values). ``boost``
    multiplies on top, as everywhere.

    The classic use at web scale is recency/authority boosting:
    ``FunctionScoreQ(inner=parse("ranked query"),
    source_field="pagerank", mode="multiply")``.

    Scale shape: the inner plan is unchanged; the value join reads
    (doc_id, source_field) ONLY — column pruning reaches the docs
    parquet scan, and the join key is the same doc_id the docs table
    is sorted by. Prebuilt-only — the query.clj:50-52 passthrough
    surface."""

    inner: Node | None = None
    source_field: str = ""
    mode: str = "multiply"
    missing: float = 0.0


@dataclass(frozen=True)
class MatchNone(Node):
    pass


def _field_spec(specs: dict[str, FieldSpec], field_name: str | None) -> FieldSpec | None:
    if field_name is None:
        return None
    return specs.get(field_name)


def _require_field(field_name: str | None, shape: str) -> str:
    if not field_name:
        raise ValidationError(
            f"{shape} query forms require a field_name "
            "(reference validation.clj:46-72)",
            {"shape": shape},
        )
    return field_name


def _string_query(
    s: str, field_name: str | None, specs, analyzers, boost: float
) -> Node:
    fname = _require_field(field_name, "string")
    fs = _field_spec(specs, fname)
    if fs is not None and fs.type != "text":
        # typed field -> exact query (reference query.clj:68-69)
        if fs.type == "keyword":
            return ExactQ(boost, fname, s, "keyword")
        if fs.type == "boolean":
            return ExactQ(boost, fname, s.lower() == "true", "boolean")
        raise ValueTypeError(
            f"string query against {fs.type} field {fname!r} requires a "
            "typed value",
            {"field": fname, "value": s},
        )
    analyzer = analyzers.get(fname) or analyzers.get(None)
    toks = analyzer.tokens(s)
    if not toks:
        return MatchNone(boost)
    # whitespace decides phrase-ness on the RAW string (query.clj:70-72)
    if _WS.search(s):
        if len(toks) == 1:
            return TermQ(boost, fname, toks[0])
        return PhraseQ(boost, fname, tuple(toks))
    if len(toks) == 1:
        return TermQ(boost, fname, toks[0])
    # single word analyzed to several tokens -> boolean OR
    # (QueryBuilder.createBooleanQuery default occur SHOULD)
    return BoolQ(boost, tuple((SHOULD, TermQ(1.0, fname, t)) for t in toks))


def parse(
    form: Any,
    specs: dict[str, FieldSpec],
    analyzers: dict,
    field_name: str | None = None,
    boost: float = 1.0,
) -> Node:
    """Shape dispatch — see module docstring."""
    if isinstance(form, Node):
        return form
    if isinstance(form, enum.Enum):  # Named (query.clj:79-81)
        return parse(form.name, specs, analyzers, field_name, boost)
    if isinstance(form, str):
        return _string_query(form, field_name, specs, analyzers, boost)
    if isinstance(form, (set, frozenset)):
        clauses = tuple(
            (SHOULD, parse(e, specs, analyzers, field_name))
            for e in sorted(form, key=repr)
        )
        return BoolQ(boost, clauses)
    if isinstance(form, (list, tuple)):
        clauses = tuple(
            (MUST, parse(e, specs, analyzers, field_name)) for e in form
        )
        return BoolQ(boost, clauses)
    if isinstance(form, dict):
        clauses = tuple(
            (MUST, parse(v, specs, analyzers, str(k)))
            for k, v in form.items()
        )
        return BoolQ(boost, clauses)
    if isinstance(form, bool):
        return _typed_exact(form, "boolean", field_name, specs, boost,
                            "Boolean query values require a boolean field "
                            "definition")
    if isinstance(form, int):
        return _typed_exact(form, "long", field_name, specs, boost,
                            "Numeric query values require a long or double "
                            "field definition")
    if isinstance(form, float):
        return _typed_exact(form, "double", field_name, specs, boost,
                            "Numeric query values require a long or double "
                            "field definition")
    if isinstance(form, (dt.datetime, dt.date)):
        return _typed_exact(form, "instant", field_name, specs, boost,
                            "Instant query values require an instant field "
                            "definition")
    raise ValidationError(
        f"unsupported query form of type {type(form).__name__}",
        {"form": form},
    )


def _typed_exact(value, want_type, field_name, specs, boost, msg) -> Node:
    fname = _require_field(field_name, want_type)
    fs = _field_spec(specs, fname)
    ok = fs is not None and (
        fs.type == want_type
        or (want_type == "long" and fs.type == "double")
    )
    if not ok:
        raise ValueTypeError(
            msg + f" (field {fname!r} is {fs.type if fs else 'undeclared'})",
            {"field": fname, "value": value},
        )
    norm = {
        "long": normalize_long,
        "double": normalize_double,
        "boolean": normalize_boolean,
        "instant": normalize_instant,
    }
    v = float(value) if fs.type == "double" else norm[want_type](value)
    return ExactQ(boost, fname, v, fs.type)


def combine_fuzzy(
    m: dict[str, str], specs: dict[str, FieldSpec]
) -> Node:
    """Fuzzy map {field: term} -> SHOULD-combined FuzzyQ nodes
    (reference query.clj:132-147); only text/keyword fields."""
    if not isinstance(m, dict):
        raise ValidationError(
            "fuzzy queries take a {field: term} mapping "
            "(reference validation.clj)",
            {"query": m},
        )
    clauses = []
    for k, v in m.items():
        fname = str(k)
        fs = specs.get(fname)
        if fs is not None and fs.type not in ("text", "keyword"):
            raise ValueTypeError(
                "Fuzzy queries are only supported for text and keyword "
                f"fields ({fname!r} is {fs.type})",
                {"field": fname, "value": v},
            )
        clauses.append((SHOULD, FuzzyQ(1.0, fname, normalize_text(v).lower())))
    return BoolQ(1.0, tuple(clauses))


# --- classic QueryParser DSL subset (query.clj:115-124) ----------------

_DSL_TOKEN = re.compile(
    r"""
    \s*(
        \( | \)
      | (?:[^\s():"]+:)?"(?:[^"\\]|\\.)*"(?:~\d+(?:\.\d+)?)?(?:\^\d+(?:\.\d+)?)?
      | (?:[^\s():"]+:)?/(?:[^/\\]|\\.)*/(?:\^\d+(?:\.\d+)?)?
      | (?:[^\s():"]+:)?[\[\{][^\]\}]*[\]\}](?:\^\d+(?:\.\d+)?)?
      | (?:AND|OR|NOT)\b | && | \|\|
      | [+\-!]
      | [^\s()]+
    )
    """,
    re.VERBOSE,
)
_BOOST = re.compile(r"\^(\d+(?:\.\d+)?)$")
_FUZZY_SUFFIX = re.compile(r"~(\d+(?:\.\d+)?)?$")
_RANGE = re.compile(r"^([\[\{])\s*(.*?)\s+TO\s+(.*?)\s*([\]\}])$", re.DOTALL)
# a token is a wildcard query iff it contains an UNESCAPED * or ?
_UNESCAPED_WILD = re.compile(r"(?<!\\)(?:\\\\)*[*?]")


def _normalize_multiterm(s: str, fname: str, specs, analyzers) -> str:
    """Lucene ``Analyzer.normalize`` as applied to wildcard / range /
    fuzzy terms: the lowercasing chains (standard, simple) lowercase;
    keyword-TYPED fields index verbatim single terms (reference
    StringField, field_types.clj:35-46) so their multi-term patterns
    stay verbatim too, as do keyword/whitespace analyzers."""
    fs = specs.get(fname)
    if fs is not None and fs.type == "keyword":
        return s
    an = analyzers.get(fname) or analyzers.get(None)
    if an is not None and an.kind in ("standard", "simple"):
        return s.lower()
    return s


def _range_endpoint(s: str):
    """``*`` (or empty) = open endpoint; surrounding quotes stripped
    (QueryParser allows ``["a" TO "b"]``)."""
    if s in ("*", ""):
        return None
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        s = s[1:-1]
    return s


def _range_node(
    fname: str, m: re.Match, specs, analyzers, boost: float
) -> Node:
    """``[a TO b]`` / ``{a TO b}`` -> RangeQ. Typed fields parse their
    endpoints by declared type (point range, constant score — Lucene's
    LongPoint/DoublePoint.newRangeQuery); text/keyword fields get the
    lexicographic TermRangeQuery semantics."""
    op, lo_s, hi_s, cl = m.group(1), m.group(2), m.group(3), m.group(4)
    include_lo = op == "["
    include_hi = cl == "]"
    lo, hi = _range_endpoint(lo_s), _range_endpoint(hi_s)
    fs = specs.get(fname)
    vtype = fs.type if fs is not None else "text"
    if vtype == "boolean":
        raise ValueTypeError(
            f"range query against boolean field {fname!r} is not "
            "supported",
            {"field": fname},
        )

    def conv(v):
        if v is None:
            return None
        try:
            if vtype == "long":
                return normalize_long(int(v))
            if vtype == "double":
                return normalize_double(float(v))
            if vtype == "instant":
                if re.fullmatch(r"-?\d+", v):
                    return normalize_instant(int(v))  # epoch millis
                return normalize_instant(
                    dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
                )
        except (ValueError, ValueTypeError) as e:
            raise ValueTypeError(
                f"range endpoint {v!r} does not parse as {vtype} for "
                f"field {fname!r}",
                {"field": fname, "value": v},
            ) from e
        return _normalize_multiterm(v, fname, specs, analyzers)

    return RangeQ(boost, fname, conv(lo), conv(hi), include_lo,
                  include_hi, vtype)


def _wildcard_node(
    fname: str, pattern: str, specs, analyzers, boost: float,
    allow_leading: bool,
) -> Node:
    fs = specs.get(fname)
    if fs is not None and fs.type not in ("text", "keyword"):
        raise ValueTypeError(
            f"wildcard query against {fs.type} field {fname!r} — "
            "wildcards apply to text/keyword fields",
            {"field": fname, "value": pattern},
        )
    if not allow_leading and pattern[:1] in ("*", "?") and pattern != "*":
        # Lucene QueryParser default: allowLeadingWildcard=false
        raise ValidationError(
            "'*' or '?' not allowed as first character in WildcardQuery "
            "(pass allow_leading_wildcard=True to enable)",
            {"pattern": pattern},
        )
    return WildcardQ(
        boost, fname, _normalize_multiterm(pattern, fname, specs, analyzers)
    )


def parse_dsl(
    dsl: str,
    default_field: str,
    specs: dict[str, FieldSpec],
    analyzers: dict,
    allow_leading_wildcard: bool = False,
) -> Node:
    """Classic Lucene QueryParser subset: whitespace-split clauses with
    default-OR combination, ``field:value``, quoted phrases, ``^boost``,
    AND/OR/NOT connectives, +required / -prohibited prefixes, and
    PARENTHESIZED GROUPS — ``(a OR b) AND c`` parses to ``+(a b) +c``
    exactly like Lucene's QueryParser, with optional ``(...)^boost``.
    Matches the reference's parser configuration: split-on-whitespace
    true, auto-generate-phrase-queries true (query.clj:119-123; behavior
    pinned by lucene_test.clj:119-135).

    Multi-term grammar (all reachable through the reference's parse-dsl
    — query.clj:115-124 feeds any string to QueryParser):
    ``term~`` / ``term~N``  fuzzy (Damerau, N in 0..2, default 2);
    ``te*t`` / ``te?t`` / ``te*``  wildcard/prefix (constant-score);
    ``[a TO b]`` / ``{a TO b}``  term range on text/keyword,
    point range on long/double/instant fields (constant-score;
    ``*`` endpoint = open); ``*:*``  match-all; ``/pattern/``
    regexp (verbatim, whole-term anchored, constant-score);
    ``&&`` / ``||`` / ``!``  operator aliases; ``f:(a b c)``
    field-scoped grouping. Leading wildcards raise unless
    ``allow_leading_wildcard=True`` (Lucene's allowLeadingWildcard
    default)."""
    default_field = str(default_field)
    raw = [m.group(1) for m in _DSL_TOKEN.finditer(dsl)]
    if not raw:
        return MatchNone()
    pos = 0

    def term_node(tok: str, dfield: str) -> Node:
        boost = 1.0
        m = _BOOST.search(tok)
        if m:
            boost = float(m.group(1))
            tok = tok[: m.start()]
        fname, value = dfield, tok
        if (
            ":" in tok
            and not tok.startswith('"')
            and not tok.startswith("[")
            and not tok.startswith("{")
            and not tok.startswith("/")
        ):
            fname, value = tok.split(":", 1)
            m2 = _BOOST.search(value)
            if m2:
                boost = float(m2.group(1))
                value = value[: m2.start()]
        if value.startswith("/") and value.endswith("/") and len(value) >= 2:
            # /pattern/ -> RegexpQuery (verbatim pattern, whole-term
            # anchored match, constant-score rewrite)
            fs0 = specs.get(fname)
            if fs0 is not None and fs0.type not in ("text", "keyword"):
                raise ValueTypeError(
                    f"regexp query against {fs0.type} field {fname!r} — "
                    "regexp applies to text/keyword fields",
                    {"field": fname, "value": value},
                )
            return RegexpQ(boost, fname, value[1:-1].replace("\\/", "/"))
        if value.startswith('"'):
            # "phrase" / "phrase"~slop (sloppy phrase; Lucene parses
            # FUZZY_SLOP as a float and TRUNCATES — "a b"~2.5 = slop 2)
            slop = 0
            body = value
            msl = re.fullmatch(
                r'("(?:[^"\\]|\\.)*")~(\d+(?:\.\d+)?)', value
            )
            if msl:
                body, slop = msl.group(1), int(float(msl.group(2)))
            if body.endswith('"') and len(body) >= 2:
                phrase = body[1:-1]
                an = analyzers.get(fname) or analyzers.get(None)
                toks = an.tokens(phrase)
                return (
                    PhraseQ(boost, fname, tuple(toks), slop)
                    if len(toks) > 1
                    else (
                        TermQ(boost, fname, toks[0])
                        if toks
                        else MatchNone()
                    )
                )
        mr = _RANGE.match(value)
        if mr:
            return _range_node(fname, mr, specs, analyzers, boost)
        if fname == "*" and value == "*":
            return MatchAll(boost)  # *:* -> MatchAllDocsQuery
        if _UNESCAPED_WILD.search(value):
            # a trailing fuzzy slop on a wildcard token ('te*t~1') is
            # stripped and ignored — Lucene's grammar tokenizes the
            # FUZZY_SLOP separately from the WILDTERM and builds the
            # wildcard from the bare pattern; keeping '~1' in the
            # pattern would silently match nothing
            mw = _FUZZY_SUFFIX.search(value)
            if mw and value[: mw.start()]:
                stripped = value[: mw.start()]
                if _UNESCAPED_WILD.search(stripped):
                    value = stripped
            return _wildcard_node(
                fname, value, specs, analyzers, boost,
                allow_leading_wildcard,
            )
        mf = _FUZZY_SUFFIX.search(value)
        if mf and value[: mf.start()]:
            base = value[: mf.start()]
            edits_s = mf.group(1)
            if edits_s is None:
                edits = 2  # bare ~ -> FuzzyQuery default
            elif "." in edits_s:
                raise ValidationError(
                    "fractional edit distances are not allowed "
                    "(Lucene FuzzyQuery)",
                    {"token": value},
                )
            else:
                edits = int(edits_s)
                if edits > 2:
                    raise ValidationError(
                        "maximum supported fuzzy edit distance is 2 "
                        "(Lucene LevenshteinAutomata limit)",
                        {"token": value},
                    )
            fs0 = specs.get(fname)
            if fs0 is not None and fs0.type not in ("text", "keyword"):
                raise ValueTypeError(
                    f"fuzzy query against {fs0.type} field {fname!r} — "
                    "fuzzy applies to text/keyword fields",
                    {"field": fname, "value": base},
                )
            return FuzzyQ(
                boost, fname,
                _normalize_multiterm(base, fname, specs, analyzers),
                edits,
            )
        # unescape \x -> x (QueryParser escape syntax) before analysis
        value = re.sub(r"\\(.)", r"\1", value)
        fs = specs.get(fname)
        an = analyzers.get(fname) or analyzers.get(None)
        if fs is not None and fs.type != "text":
            return _string_query(value, fname, specs, analyzers, boost)
        toks = an.tokens(value)
        if not toks:
            return MatchNone(boost)
        if len(toks) == 1:
            return TermQ(boost, fname, toks[0])
        # auto-generate-phrase-queries: one whitespace token analyzing
        # to several terms becomes a phrase
        return PhraseQ(boost, fname, tuple(toks))

    def parse_group(at_top: bool, dfield: str) -> Node:
        """Recursive descent over one paren level — consumes tokens up
        to the matching ')' (or end of input). ``dfield`` is the
        default field for this level: ``f:(a b c)`` rebinds it for the
        group's span, like QueryParser's field-scoped grouping."""
        nonlocal pos
        clauses: list[tuple[str, Node]] = []
        pending_occur: str | None = None
        connective: str | None = None

        def group_boost(child: Node) -> Node:
            # optional (...)^boost — the tokenizer emits '^N' as its
            # own token right after the ')'
            nonlocal pos
            if pos < len(raw):
                mb = _BOOST.fullmatch(raw[pos])
                if mb:
                    pos += 1
                    return dc_replace(
                        child, boost=child.boost * float(mb.group(1))
                    )
            return child

        def finish(node: Node):
            nonlocal pending_occur, connective
            occ = SHOULD
            if connective == "AND":
                occ = MUST
                # retro-promote the previous clause to MUST — Lucene's
                # addClause does this on CONJ_AND REGARDLESS of the new
                # clause's own modifier, so 'a AND NOT b' = '+a -b'
                if clauses and clauses[-1][0] == SHOULD:
                    clauses[-1] = (MUST, clauses[-1][1])
            if pending_occur:
                occ = pending_occur
            clauses.append((occ, node))
            pending_occur = None
            connective = None

        while pos < len(raw):
            tok = raw[pos]
            pos += 1
            if tok in ("AND", "OR", "&&", "||"):
                connective = "AND" if tok in ("AND", "&&") else "OR"
                continue
            if tok in ("NOT", "-", "!"):
                pending_occur = "MUST_NOT"
                continue
            if tok == "+":
                pending_occur = MUST
                continue
            gfield = None
            if (
                tok.endswith(":")
                and len(tok) > 1
                and pos < len(raw)
                and raw[pos] == "("
            ):
                # f:(a b c) — field-scoped group (QueryParser rebinds
                # the default field for the group's span)
                gfield = tok[:-1]
                tok = raw[pos]
                pos += 1
            if tok == "(":
                child = group_boost(
                    parse_group(False, gfield if gfield else dfield)
                )
                if not isinstance(child, MatchNone):
                    finish(child)
                else:
                    pending_occur = None
                    connective = None
                continue
            if tok == ")":
                if at_top:
                    continue  # unbalanced ')' — ignored like stray token
                break
            finish(term_node(tok, dfield))

        if not clauses:
            return MatchNone()
        if len(clauses) == 1 and clauses[0][0] == SHOULD:
            return clauses[0][1]
        return BoolQ(1.0, tuple(clauses))

    return parse_group(True, default_field)


def render(node: Node) -> str:
    """Debug rendering loosely like Lucene's Query.toString (the
    reference asserts on that string at lucene_test.clj:119-122)."""
    if isinstance(node, TermQ):
        s = f"{node.field}:{node.term}"
    elif isinstance(node, PhraseQ):
        s = f"{node.field}:\"{' '.join(node.terms)}\""
        if node.slop:
            s += f"~{node.slop}"
    elif isinstance(node, WildcardQ):
        s = f"{node.field}:{node.pattern}"
    elif isinstance(node, RegexpQ):
        s = f"{node.field}:/{node.pattern.replace('/', chr(92) + '/')}/"
    elif isinstance(node, RangeQ):
        lo = "*" if node.lo is None else node.lo
        hi = "*" if node.hi is None else node.hi
        s = (
            f"{node.field}:{'[' if node.include_lo else '{'}{lo} TO "
            f"{hi}{']' if node.include_hi else '}'}"
        )
    elif isinstance(node, MatchAll):
        s = "*:*"
    elif isinstance(node, ExactQ):
        s = f"{node.field}:{node.value}"
    elif isinstance(node, FuzzyQ):
        s = f"{node.field}:{node.term}~{node.max_edits}"
    elif isinstance(node, DisMaxQ):
        # Lucene DisjunctionMaxQuery.toString: (a | b | c)~tie
        s = "(" + " | ".join(render(d) for d in node.disjuncts) + ")"
        if node.tie_breaker:
            s += f"~{node.tie_breaker}"
    elif isinstance(node, SpanFirstQ):
        # Lucene SpanFirstQuery.toString: spanFirst(field:term, end)
        s = f"spanFirst({node.field}:{node.term}, {node.end})"
    elif isinstance(node, ConstantScoreQ):
        # Lucene ConstantScoreQuery.toString
        inner = render(node.inner) if node.inner is not None else ""
        s = f"ConstantScore({inner})"
    elif isinstance(node, TermInSetQ):
        # Lucene TermInSetQuery.toString: field:(a b c)
        s = f"{node.field}:({' '.join(node.terms)})"
    elif isinstance(node, SpanNearQ):
        # Lucene SpanNearQuery.toString:
        # spanNear([f:a, f:b], slop, inOrder)
        clauses = ", ".join(f"{node.field}:{t}" for t in node.terms)
        s = (f"spanNear([{clauses}], {node.slop}, "
             f"{str(node.in_order).lower()})")
    elif isinstance(node, SpanOrQ):
        # Lucene SpanOrQuery.toString: spanOr([f:a, f:b])
        clauses = ", ".join(f"{node.field}:{t}" for t in node.terms)
        s = f"spanOr([{clauses}])"
    elif isinstance(node, SpanNotQ):
        # Lucene SpanNotQuery.toString: spanNot(f:a, f:b, pre, post)
        s = (f"spanNot({node.field}:{node.include}, "
             f"{node.field}:{node.exclude}, {node.pre}, {node.post})")
    elif isinstance(node, FunctionScoreQ):
        # Lucene FunctionScoreQuery.toString: FunctionScoreQuery(q,
        # scored by double(field))
        inner = render(node.inner) if node.inner is not None else ""
        s = (f"FunctionScoreQuery({inner}, scored by "
             f"double({node.source_field}), {node.mode})")
    elif isinstance(node, MultiPhraseQ):
        # Lucene MultiPhraseQuery.toString: field:"(a app) store"
        slots = " ".join(
            ts[0] if len(ts) == 1 else "(" + " ".join(ts) + ")"
            for ts in node.positions
        )
        s = f'{node.field}:"{slots}"'
    elif isinstance(node, BoolQ):
        parts = []
        for occ, n in node.clauses:
            prefix = (
                "+" if occ == MUST
                else "-" if occ == "MUST_NOT"
                else "#" if occ == FILTER  # Lucene toString for FILTER
                else ""
            )
            inner = render(n)
            # Lucene wraps sub-BooleanQueries in parens in toString()
            if isinstance(n, BoolQ) and n.boost == 1.0:
                inner = f"({inner})"
            parts.append(prefix + inner)
        s = " ".join(parts)
        if node.min_should_match:
            s = f"({s})~{node.min_should_match}"
    else:
        s = "MatchNone"
    if node.boost != 1.0:
        s = f"({s})^{node.boost}"
    return s
