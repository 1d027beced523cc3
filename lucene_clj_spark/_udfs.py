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


def contexts_udf(fn):
    """Struct(all columns) -> ArrayType(StringType): the reference's
    arbitrary contexts-from fn surface (document.clj:72-75)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def derive(rows: pd.DataFrame) -> pd.Series:
        return rows.apply(lambda r: [str(x) for x in fn(r.to_dict())], axis=1)

    return derive
