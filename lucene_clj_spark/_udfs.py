"""Pandas-UDF factories.

Kept in a module WITHOUT ``from __future__ import annotations`` so
PySpark can introspect the real pandas type hints (stringified hints are
rejected by the Arrow UDF signature inference in PySpark 4)."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def analyze_udf(analyzer):
    """StringType -> ArrayType(StringType) vectorized tokenizer."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def analyze(s: pd.Series) -> pd.Series:
        return analyzer.tokens_series(s)

    return analyze


POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.IntegerType()),
        T.StructField("dl", T.IntegerType()),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
    ]
)


def flat_postings_generator(text_fields, kw_fields, analyzers, default_an):
    """mapInPandas generator: documents -> FLAT postings rows in one
    Arrow pass (tokenize + per-doc inversion, partition-local, no
    shuffle of token occurrences).

    Emitting the final flat schema directly — instead of a
    struct<terms[],tfs[],poss[][]> column exploded JVM-side — matters
    because Spark's in-memory columnar cache handles nested
    array-of-array structs on a slow generic path: the flat layout
    measured ~4x faster to cache-materialize + re-scan at local[8]
    (tools/exp_cache.py). Per text field each doc also yields ONE
    marker row (term=NULL, dl=token count) so corpus stats (N, sum_dl)
    aggregate from the same cached relation without re-tokenizing.

    ``text_fields``: list of (name, multi_valued); ``kw_fields``: list
    of (name, multi_valued); ``analyzers``: {name: Analyzer}.
    """

    def emit(batches):
        import numpy as np

        for pdf in batches:
            doc_ids = np.asarray(pdf["doc_id"], dtype=np.int64)
            n_docs = len(doc_ids)
            parts = []  # per-field (field_arr, term, id_arr, tf, dl_arr, pos)
            for name, multi in text_fields:
                an = analyzers.get(name, default_an)
                vals = pdf[name]
                if multi:
                    # null elements are dropped, matching the previous
                    # F.array_join behavior (null-safe join)
                    vals = vals.map(
                        lambda v: " \x1f ".join(
                            x for x in v if x is not None
                        )
                        if v is not None
                        else ""
                    )
                # per-doc inversion appends straight into flat column
                # buffers; the repeated columns (field/doc_id/dl) are
                # np.repeat'ed afterwards — building them as Python
                # lists measured ~2x the whole kernel's cost
                t_col: list = []
                tf_col: list = []
                pos_col: list = []
                counts = np.empty(n_docs, dtype=np.int64)
                dls = np.empty(n_docs, dtype=np.int32)
                for i, toks in enumerate(an.tokens_series(vals)):
                    acc: dict = {}
                    for pos, t in enumerate(toks):
                        lst = acc.get(t)
                        if lst is None:
                            acc[t] = [pos]
                        else:
                            lst.append(pos)
                    t_col.extend(acc.keys())
                    t_col.append(None)  # stats marker row
                    tf_col.extend(len(p) for p in acc.values())
                    tf_col.append(0)
                    pos_col.extend(acc.values())
                    pos_col.append(None)
                    counts[i] = len(acc) + 1
                    dls[i] = len(toks)
                total = int(counts.sum())
                parts.append((
                    np.full(total, name, dtype=object),
                    t_col,
                    np.repeat(doc_ids, counts),
                    np.asarray(tf_col, dtype=np.int32),
                    np.repeat(dls, counts),
                    pos_col,
                ))
            for name, multi in kw_fields:
                t_col, id_col = [], []
                for did, v in zip(doc_ids, pdf[name]):
                    if v is None:
                        continue
                    vals = v if multi else (v,)
                    seen = set()
                    for item in vals:
                        if item is None:
                            continue
                        s = str(item)
                        if s in seen:
                            continue
                        seen.add(s)
                        t_col.append(s)
                        id_col.append(did)
                total = len(t_col)
                ones = np.ones(total, dtype=np.int32)
                parts.append((
                    np.full(total, name, dtype=object),
                    t_col,
                    np.asarray(id_col, dtype=np.int64),
                    ones,
                    ones,
                    [None] * total,
                ))
            if not parts:
                yield pd.DataFrame(
                    {"field": [], "term": [], "doc_id": [], "tf": [],
                     "dl": [], "positions": []}
                )
                continue
            if len(parts) == 1:
                f, t, i, tf, dl, p = parts[0]
            else:
                f = np.concatenate([x[0] for x in parts])
                t = [v for x in parts for v in x[1]]
                i = np.concatenate([x[2] for x in parts])
                tf = np.concatenate([x[3] for x in parts])
                dl = np.concatenate([x[4] for x in parts])
                p = [v for x in parts for v in x[5]]
            yield pd.DataFrame(
                {
                    "field": f,
                    "term": t,
                    "doc_id": i,
                    "tf": tf,
                    "dl": dl,
                    "positions": p,
                }
            )

    return emit


def flat_postings_arrow_generator(text_fields, kw_fields, analyzers,
                                  default_an):
    """mapInArrow generator: documents -> FLAT postings RecordBatches.

    Same contract as :func:`flat_postings_generator` (one row per
    distinct (field, term, doc) with ascending positions, plus one
    stats-marker row per (text field, doc) with term=NULL and
    dl=token count) — pinned row-set-identical by
    tests/test_arrow_kernel.py — but the per-doc Python dict inversion
    is replaced by a batch-level vectorized inversion:

      flatten all tokens -> pd.factorize (C hashing) -> stable argsort
      on (doc, term-code) -> group boundaries via diff -> tf = group
      sizes, positions = ONE zero-copy pyarrow ListArray built from
      (group offsets, sorted position values).

    The stable sort keeps each group's positions in original token
    order (ascending within a doc), so per-group position lists never
    materialize as Python objects. Measured 3.8x faster than the dict
    loop on sf0.1 web text (73.6ms vs 280.4ms per 10k-doc batch,
    /tmp-prototype recorded in BENCH/BASELINE.md), and yielding arrow
    RecordBatches also skips the pandas block-manager assembly the
    pandas generator paid on every batch. This kernel is the build's
    hot path (reference analogue: Lucene's DocumentsWriter per-thread
    inversion, indexer.clj:33-40)."""
    import numpy as np
    import pyarrow as pa
    from itertools import chain

    pos_type = pa.list_(pa.int32())
    out_schema = pa.schema(
        [
            ("field", pa.string()),
            ("term", pa.string()),
            ("doc_id", pa.int64()),
            ("tf", pa.int32()),
            ("dl", pa.int32()),
            ("positions", pos_type),
        ]
    )

    _EMPTY = None  # placeholder for the zero-token return, built lazily

    def _empty_inversion(lens):
        return (
            np.empty(0, dtype=np.int64),
            pa.array([], type=pa.string()),
            np.empty(0, dtype=np.int32),
            pa.array([], type=pos_type),
            lens,
        )

    def _invert_codes(codes, n_uniq, lens, n_docs):
        """Core batch inversion over FACTORIZED token codes. Returns
        (g_doc, first_codes, tf, positions ListArray) where groups are
        sorted by (doc index, first-appearance term code)."""
        total = codes.size
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        starts_per_doc = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts_per_doc[1:])
        pos = (
            np.arange(total, dtype=np.int64)
            - np.repeat(starts_per_doc, lens)
        )
        key = doc_idx * n_uniq + codes
        order = np.argsort(key, kind="stable")
        ks = key[order]
        grp_start = np.flatnonzero(
            np.concatenate(([True], ks[1:] != ks[:-1]))
        )
        ends = np.concatenate((grp_start[1:], [total]))
        tf = (ends - grp_start).astype(np.int32)
        first = order[grp_start]
        g_doc = doc_idx[first]
        first_codes = codes[first]
        offsets = np.concatenate((grp_start, [total])).astype(np.int32)
        positions = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(pos[order].astype(np.int32))
        )
        return g_doc, first_codes, tf, positions

    def _invert_text(tok_lists, n_docs):
        """Batch inversion over Python token lists (the full-analyzer
        path). Returns (g_doc, g_terms pa.StringArray, tf, positions
        ListArray, lens)."""
        lens = np.fromiter(map(len, tok_lists), dtype=np.int64,
                           count=n_docs)
        total = int(lens.sum())
        if total == 0:
            return _empty_inversion(lens)
        flat = np.asarray(
            list(chain.from_iterable(tok_lists)), dtype=object
        )
        codes, uniq = pd.factorize(flat)
        g_doc, first_codes, tf, positions = _invert_codes(
            codes.astype(np.int64), len(uniq), lens, n_docs
        )
        g_terms = pa.array(
            np.asarray(uniq, dtype=object)[first_codes],
            type=pa.string(),
        )
        return g_doc, g_terms, tf, positions, lens

    def _invert_flat_arrow(flat, lens, n_docs):
        """Batch inversion over an Arrow-native flat token array (the
        tokens_arrow_fast path): C++ dictionary_encode replaces the
        object-array pd.factorize, and term strings never materialize
        as Python objects."""
        total = len(flat)
        if total == 0:
            return _empty_inversion(lens)
        dict_arr = flat.dictionary_encode()
        codes = dict_arr.indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        uniq = dict_arr.dictionary
        g_doc, first_codes, tf, positions = _invert_codes(
            codes, len(uniq), lens, n_docs
        )
        g_terms = uniq.take(pa.array(first_codes))
        return g_doc, g_terms, tf, positions, lens

    def emit(batches):
        for rb in batches:
            names = rb.schema.names
            doc_ids = rb.column(names.index("doc_id")).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            n_docs = len(doc_ids)
            parts = []  # (field, term, doc_id, tf, dl, positions) arrays
            for name, multi in text_fields:
                an = analyzers.get(name, default_an)
                res = None
                if not multi:
                    # arrow-native fast path: split + empty-drop +
                    # dictionary-encode all in C++, no Python tokens
                    res = an.tokens_arrow_fast(
                        rb.column(names.index(name))
                    )
                if res is not None:
                    g_doc, g_terms, tf, positions, lens = (
                        _invert_flat_arrow(res[0], res[1], n_docs)
                    )
                else:
                    vals = rb.column(names.index(name)).to_pandas()
                    if multi:
                        vals = vals.map(
                            lambda v: " \x1f ".join(
                                x for x in v if x is not None
                            )
                            if v is not None
                            else ""
                        )
                    tok_lists = an.tokens_series(vals).tolist()
                    g_doc, g_terms, tf, positions, lens = _invert_text(
                        tok_lists, n_docs
                    )
                ng = len(tf)
                parts.append(
                    (
                        pa.array(np.full(ng + n_docs, name, dtype=object)),
                        pa.concat_arrays(
                            [
                                g_terms,
                                pa.nulls(n_docs, pa.string()),
                            ]
                        ),
                        pa.array(
                            np.concatenate((doc_ids[g_doc], doc_ids))
                        ),
                        pa.array(
                            np.concatenate(
                                (tf, np.zeros(n_docs, dtype=np.int32))
                            )
                        ),
                        pa.array(
                            np.concatenate(
                                (lens[g_doc], lens)
                            ).astype(np.int32)
                        ),
                        pa.concat_arrays(
                            [positions, pa.nulls(n_docs, pos_type)]
                        ),
                    )
                )
            for name, multi in kw_fields:
                t_col, id_col = [], []
                for did, v in zip(
                    doc_ids, rb.column(names.index(name)).to_pylist()
                ):
                    if v is None:
                        continue
                    vs = v if multi else (v,)
                    seen = set()
                    for item in vs:
                        if item is None:
                            continue
                        s = str(item)
                        if s in seen:
                            continue
                        seen.add(s)
                        t_col.append(s)
                        id_col.append(did)
                total = len(t_col)
                ones = np.ones(total, dtype=np.int32)
                parts.append(
                    (
                        pa.array(np.full(total, name, dtype=object)),
                        pa.array(t_col, type=pa.string()),
                        pa.array(np.asarray(id_col, dtype=np.int64)),
                        pa.array(ones),
                        pa.array(ones),
                        pa.nulls(total, pos_type),
                    )
                )
            if not parts:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([], type=f.type) for f in out_schema],
                    schema=out_schema,
                )
                continue
            if len(parts) == 1:
                cols = list(parts[0])
            else:
                cols = [
                    pa.concat_arrays([p[i] for p in parts])
                    for i in range(6)
                ]
            yield pa.RecordBatch.from_arrays(cols, schema=out_schema)

    return emit


def shingle_udf(analyzer, n):
    """StringType -> ArrayType(StringType): distinct word n-gram
    shingles. Tokenize + shingle in one Arrow batch pass (Spark forbids
    Python-UDF columns inside higher-order-function lambdas, so the
    shingling cannot wrap the tokenizer column)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def shingles(s: pd.Series) -> pd.Series:
        def sh(toks):
            if len(toks) < n:
                return []
            seen, out = set(), []
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                if g not in seen:
                    seen.add(g)
                    out.append(g)
            return out

        return analyzer.tokens_series(s).map(sh)

    return shingles


def edit_distance_udf(query, max_edits=None):
    """StringType -> IntegerType: Damerau-Levenshtein distance to the
    fixed query term (transpositions count 1, Lucene FuzzyQuery
    semantics — see fuzzy.py). Arrow-batched; runs over the pruned term
    dictionary, never over postings. With ``max_edits`` the per-pair DP
    short-circuits on the length bound (fuzzy.bounded_distance)."""
    from lucene_clj_spark.fuzzy import bounded_distance, damerau_levenshtein

    if max_edits is None:
        fn = lambda t: damerau_levenshtein(t, query)  # noqa: E731
    else:
        fn = lambda t: bounded_distance(t, query, max_edits)  # noqa: E731

    @F.pandas_udf(T.IntegerType())
    def dist(s: pd.Series) -> pd.Series:
        return s.map(fn).astype("int32")

    return dist


def hit_doc_generator(fn, extra_cols):
    """mapInPandas generator for the arbitrary ``hit->doc`` projection
    (reference search.clj:49-54, document.clj:126-144): ``fn`` receives
    each stored-doc row as a dict and returns a dict matching the
    declared output columns. (doc_id, score) ride along unchanged."""

    def gen(batches):
        for pdf in batches:
            meta = pdf[["doc_id", "score"]].reset_index(drop=True)
            rows = [
                fn(r)
                for r in pdf.drop(columns=["score"]).to_dict("records")
            ]
            out = pd.DataFrame(rows, columns=extra_cols)
            yield pd.concat([meta, out], axis=1)

    return gen


def contexts_udf(fn):
    """Struct(all columns) -> ArrayType(StringType): the reference's
    arbitrary contexts-from fn surface (document.clj:72-75)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def derive(rows: pd.DataFrame) -> pd.Series:
        return rows.apply(lambda r: [str(x) for x in fn(r.to_dict())], axis=1)

    return derive
