"""Hit highlighting — deterministic single-passage snippets.

Lucene ships highlighting as a search-time add-on over stored fields
(UnifiedHighlighter; the reference exposes stored-field retrieval that
users feed into it, reference search.clj:49-54). This module is the
Spark-native analogue with a DETERMINISTIC spec, so results are
oracle-checkable:

- run the normal top-k search (any kernel/DataFrame route);
- for each hit, re-analyze the stored field WITH OFFSETS;
- the passage is the ``2*window+1``-token span centered on the FIRST
  matched token (clipped at the document edges);
- the snippet is the ORIGINAL text slice covering that span, with
  every matched token inside it wrapped in ``pre_tag``/``post_tag``;
- hits whose field contains no query term get a null snippet (e.g.
  multi-field queries matching via another field).

Scale: highlighting is per-RETURNED-hit work — the passage UDF runs
Arrow-batched over the already-top-k-bounded page (k rows, one batch),
exactly like Lucene highlighting the stored fields of the page it is
about to return. Nothing here touches the corpus beyond the normal
top-k plan plus the k-row stored-field seek ``search`` already does.

Offsets: ``tokens_with_offsets`` mirrors ``analysis`` token-for-token
(standard/simple/whitespace/keyword), pinned by test against
``Analyzer.tokens``. Lowercasing analyzers compute offsets on
``text.lower()``; in the rare case lowering changes the string length
(e.g. ``İ``), the snippet is built from the lowered text instead —
tokens stay identical to what was indexed, which is the invariant that
matters. Tokens longer than ``max_token_length`` are emitted in
chunks with exact sub-spans, matching the index-side chunking.
"""

from __future__ import annotations

import re
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_clj_spark.analysis import (
    _LETTER_COMMA_SPLIT,
    _SIMPLE_PATTERN,
    _STANDARD_PATTERN,
    Analyzer,
)
from lucene_clj_spark.errors import ValidationError
from lucene_clj_spark.query import BoolQ, Node, PhraseQ, TermQ, parse

_WS_PATTERN = re.compile(r"\S+")
_MID_STRIP = "'’.·:,;"


def _emit_chunks(tok: str, start: int, max_len: int,
                 out: list[tuple[str, int, int]]) -> None:
    if len(tok) <= max_len:
        out.append((tok, start, start + len(tok)))
        return
    for i in range(0, len(tok), max_len):
        part = tok[i : i + max_len]
        out.append((part, start + i, start + i + len(part)))


def _standard_offsets(base: str, stop: frozenset[str], max_len: int
                      ) -> list[tuple[str, int, int]]:
    out: list[tuple[str, int, int]] = []
    for m in _STANDARD_PATTERN.finditer(base):
        raw, rbase = m.group(), m.start()
        pos = 0
        for part in _LETTER_COMMA_SPLIT.split(raw):
            at = raw.index(part, pos) if part else pos
            pos = at + len(part)
            lead = len(part) - len(part.lstrip(_MID_STRIP))
            core = part.strip(_MID_STRIP)
            if not core or core in stop:
                continue
            _emit_chunks(core, rbase + at + lead, max_len, out)
    return out


def _simple_offsets(base: str, _stop: frozenset[str], max_len: int
                    ) -> list[tuple[str, int, int]]:
    out: list[tuple[str, int, int]] = []
    for m in _SIMPLE_PATTERN.finditer(base):
        _emit_chunks(m.group(), m.start(), max_len, out)
    return out


def tokens_with_offsets(text: str | None, analyzer: Analyzer
                        ) -> tuple[list[tuple[str, int, int]], str]:
    """``([(token, start, end), ...], base_text)`` — the same token
    sequence ``analyzer.tokens(text)`` yields, with character spans
    into ``base_text`` (the original text, or its lowering for
    lowercasing analyzers when ``lower()`` changed the length)."""
    if not text:
        return [], text or ""
    if analyzer.kind == "keyword":
        return [(text, 0, len(text))], text
    if analyzer.kind == "whitespace":
        return (
            [(m.group(), m.start(), m.end())
             for m in _WS_PATTERN.finditer(text)],
            text,
        )
    low = text.lower()
    base = text if len(low) == len(text) else low
    if analyzer.kind == "simple":
        toks = _simple_offsets(low, analyzer.stop_words,
                               analyzer.max_token_length)
    elif analyzer.kind == "standard":
        toks = _standard_offsets(low, analyzer.stop_words,
                                 analyzer.max_token_length)
    else:
        raise ValidationError(
            f"unknown analyzer kind: {analyzer.kind!r}", {})
    return toks, base


def _highlight_leaves(node: Node, field: str) -> set[str]:
    """Analyzed terms of the query that should light up in ``field`` —
    term leaves plus phrase members (MUST_NOT never highlights)."""
    if isinstance(node, TermQ):
        return {node.term} if node.field == field else set()
    if isinstance(node, PhraseQ):
        return set(node.terms) if node.field == field else set()
    if isinstance(node, BoolQ):
        out: set[str] = set()
        for occ, child in node.clauses:
            if occ != "MUST_NOT":
                out |= _highlight_leaves(child, field)
        return out
    return set()


def make_snippet(
    text: str | None,
    analyzer: Analyzer,
    matchset: frozenset[str],
    window: int,
    pre_tag: str,
    post_tag: str,
) -> str | None:
    """The deterministic passage for one document (see module doc)."""
    toks, base = tokens_with_offsets(text, analyzer)
    first = next(
        (i for i, (t, _s, _e) in enumerate(toks) if t in matchset), None
    )
    if first is None:
        return None
    lo = max(0, first - window)
    hi = min(len(toks) - 1, first + window)
    parts: list[str] = []
    cur = toks[lo][1]
    for t, s, e in toks[lo : hi + 1]:
        parts.append(base[cur:s])
        word = base[s:e]
        parts.append(pre_tag + word + post_tag if t in matchset else word)
        cur = e
    return "".join(parts)


def highlight(
    index,
    query: Any,
    field: str,
    *,
    field_name: str | None = None,
    results_per_page: int = 10,
    window: int = 3,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    strategy: str = "auto",
) -> DataFrame:
    """Top-k search + snippet per hit over stored field ``field``.

    Returns ``(doc_id, score, snippet)`` in search order. The search
    itself routes exactly as ``Index.search`` (segment kernels when
    eligible); the snippet pass is an Arrow-batched map over the k
    returned hits only."""
    from lucene_clj_spark.search import search

    if field not in index.docs.columns:
        raise ValidationError(
            f"highlight field {field!r} is not a stored field",
            {"field": field},
        )
    ast = parse(query, index.specs, index.analyzers, field_name or field)
    matchset = frozenset(_highlight_leaves(ast, field))
    if not matchset:
        raise ValidationError(
            "highlight needs at least one term/phrase leaf on the "
            "highlighted field (term, boolean-of-terms, phrase)",
            {"query": repr(query), "field": field},
        )
    top = search(
        index,
        ast,
        results_per_page=results_per_page,
        with_hit=True,
        hit_columns=[field],
        strategy=strategy,
    )
    analyzer = index.analyzer_for(field)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "score": pdf["score"],
                    "snippet": [
                        make_snippet(t, analyzer, matchset, window,
                                     pre_tag, post_tag)
                        for t in pdf[field]
                    ],
                }
            )

    return top.mapInPandas(
        gen, "doc_id long, score double, snippet string"
    ).orderBy(F.desc("score"), F.asc("doc_id"))
