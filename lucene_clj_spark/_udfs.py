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
        for pdf in batches:
            f_col, t_col, id_col = [], [], []
            tf_col, dl_col, pos_col = [], [], []
            doc_ids = pdf["doc_id"]
            for name, multi in text_fields:
                an = analyzers.get(name, default_an)
                vals = pdf[name]
                if multi:
                    vals = vals.map(
                        lambda v: " \x1f ".join(v) if v is not None else ""
                    )
                for did, toks in zip(doc_ids, an.tokens_series(vals)):
                    acc: dict = {}
                    for pos, t in enumerate(toks):
                        lst = acc.get(t)
                        if lst is None:
                            acc[t] = [pos]
                        else:
                            lst.append(pos)
                    dl = len(toks)
                    n_terms = len(acc)
                    f_col.extend([name] * (n_terms + 1))
                    id_col.extend([did] * (n_terms + 1))
                    t_col.extend(acc.keys())
                    tf_col.extend(len(p) for p in acc.values())
                    pos_col.extend(acc.values())
                    dl_col.extend([dl] * (n_terms + 1))
                    t_col.append(None)  # stats marker row
                    tf_col.append(0)
                    pos_col.append(None)
            for name, multi in kw_fields:
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
                        f_col.append(name)
                        t_col.append(s)
                        id_col.append(did)
                        tf_col.append(1)
                        dl_col.append(1)
                        pos_col.append(None)
            yield pd.DataFrame(
                {
                    "field": f_col,
                    "term": t_col,
                    "doc_id": id_col,
                    "tf": tf_col,
                    "dl": dl_col,
                    "positions": pos_col,
                }
            )

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


def contexts_udf(fn):
    """Struct(all columns) -> ArrayType(StringType): the reference's
    arbitrary contexts-from fn surface (document.clj:72-75)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def derive(rows: pd.DataFrame) -> pd.Series:
        return rows.apply(lambda r: [str(x) for x in fn(r.to_dict())], axis=1)

    return derive
