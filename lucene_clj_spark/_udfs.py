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


TERM_VECTOR_TYPE = T.StructType(
    [
        T.StructField("dl", T.IntegerType()),
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
        T.StructField(
            "poss", T.ArrayType(T.ArrayType(T.IntegerType()))
        ),
    ]
)


def term_vectors_udf(analyzer):
    """StringType -> struct<dl, terms[], tfs[], poss[][]>: tokenize AND
    invert per document in one Arrow pass. Per-document inversion is
    local (no shuffle) — this is what makes the index build scale
    linearly: the only shuffled data afterwards is per-(doc,term)
    aggregates, never raw token occurrences. The output is COLUMNAR
    (parallel primitive arrays, zipped JVM-side with arrays_zip) because
    Arrow conversion of per-term Python dict structs dominates build
    time otherwise (~3x slower measured at sf0.1)."""

    @F.pandas_udf(TERM_VECTOR_TYPE)
    def term_vectors(s: pd.Series) -> pd.DataFrame:
        dls, terms_c, tfs_c, poss_c = [], [], [], []
        for toks in analyzer.tokens_series(s):
            acc: dict = {}
            for pos, t in enumerate(toks):
                lst = acc.get(t)
                if lst is None:
                    acc[t] = [pos]
                else:
                    lst.append(pos)
            dls.append(len(toks))
            terms_c.append(list(acc.keys()))
            tfs_c.append([len(p) for p in acc.values()])
            poss_c.append(list(acc.values()))
        return pd.DataFrame(
            {"dl": dls, "terms": terms_c, "tfs": tfs_c, "poss": poss_c}
        )

    return term_vectors


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
