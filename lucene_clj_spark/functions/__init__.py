"""Training-data pipeline operators over document/embedding tables.

Beyond the reference's own surface (SURVEY.md §2.12 lists what it lacks),
these are the large-scale corpus-preparation operators a 100 TB web-text
pipeline needs, built Spark-first:

- dedup.py : exact, n-gram Jaccard, MinHash+LSH, SimHash near-dup
- ann.py   : brute-force cosine top-k + LSH-bucketed approximate variant
             + embedding-cosine near-dup pairs
- text.py  : token/quality statistics, language-ID heuristic, document
             fingerprinting
- multimodal.py : opaque-binary media columns (image/audio/video) with
             Arrow-batched feature/decode/resize/frame-sample plumbing;
             codec-dependent kernels are deterministic stubs (the libs
             aren't in this container), the Spark side is real

Everything uses a PORTABLE hash (first 8 hex chars of md5 -> int64) so
the same arithmetic runs as Spark Columns and as DuckDB oracle SQL.
"""
