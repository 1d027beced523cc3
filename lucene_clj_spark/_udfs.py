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


def shingle_udf(analyzer, n):
    """StringType -> ArrayType(StringType): distinct word n-gram
    shingles. Tokenize + shingle in one Arrow batch pass (Spark forbids
    Python-UDF columns inside higher-order-function lambdas, so the
    shingling cannot wrap the tokenizer column)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def shingles(s: pd.Series) -> pd.Series:
        def sh(text):
            toks = analyzer.tokens(text or "")
            if len(toks) < n:
                return []
            seen, out = set(), []
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                if g not in seen:
                    seen.add(g)
                    out.append(g)
            return out

        return s.map(sh)

    return shingles


def contexts_udf(fn):
    """Struct(all columns) -> ArrayType(StringType): the reference's
    arbitrary contexts-from fn surface (document.clj:72-75)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def derive(rows: pd.DataFrame) -> pd.Series:
        return rows.apply(lambda r: [str(x) for x in fn(r.to_dict())], axis=1)

    return derive
