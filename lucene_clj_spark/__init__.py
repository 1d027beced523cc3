"""lucene_clj_spark — a PySpark-native full-text indexing + BM25 query engine.

A from-scratch re-expression of the capabilities of jaju/lucene-clj
(reference: /root/reference, a thin Clojure wrapper over Apache Lucene
10.4.0) as idiomatic Spark DataFrame pipelines:

- analysis (StandardAnalyzer-equivalent tokenize/lowercase/stop-filter)
  as vectorized Arrow UDFs                      -> lucene_clj_spark.analysis
- inverted-index build (postings/terms/stats/suggest tables, compressed
  posting blocks with block-max metadata)       -> lucene_clj_spark.indexer
- Lucene-exact BM25 (k1=1.2, b=0.75, byte-quantized length norms)
                                                -> lucene_clj_spark.bm25
- shape-driven query compiler (AND/OR/map/string/typed-exact/fuzzy/DSL)
                                                -> lucene_clj_spark.query
- top-k search, :page and :search-after pagination
                                                -> lucene_clj_spark.search
- prefix/fuzzy/context completion suggestions   -> lucene_clj_spark.suggest
- count / facets / field-sort / explain collectors
                                                -> lucene_clj_spark.collectors
- deterministic hit highlighting (snippets)     -> lucene_clj_spark.highlight
- block-max WAND scoring kernel                 -> lucene_clj_spark.wand
- training-data pipeline ops (dedup, ANN, text quality)
                                                -> lucene_clj_spark.functions

Public API facade mirrors the reference's `msync.lucene` namespace
(src/clj/msync/lucene.clj:16-68): create_index / Index.search /
Index.suggest / open_session.
"""

from lucene_clj_spark.schema import FieldSpec, normalize_field_specs
from lucene_clj_spark.indexer import Index, create_index
from lucene_clj_spark.session import open_session

__all__ = [
    "FieldSpec",
    "Index",
    "create_index",
    "normalize_field_specs",
    "open_session",
]

__version__ = "0.1.0"
