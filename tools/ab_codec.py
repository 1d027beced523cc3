"""Matched-window A/B: FOR bit-packed segment blocks (format 3) vs
the varint blocks (format 2). Run once per REPO REVISION (the codec
is baked into executor-side imports, so the A/B interleaves two
checkouts in subprocesses rather than monkeypatching):

    python tools/ab_codec.py <tag>

Builds a disk index + segments from the bench corpus (cycles x SF_DIR
docs), then times build_segments and a set of WAND kernel queries;
prints ONE JSON line {"tag":..., "build_segments": s, "seg_bytes": n,
"queries": {...}}. An outer loop interleaves revisions best-of-N.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "head"
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import bench
    from lucene_clj_spark import create_index, segments, wand

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = bench.build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs, n_docs = bench.cycled_docs(spark, bench.SF_DIR, cycles)

    work = tempfile.mkdtemp(prefix=f"ab_codec_{tag}_")
    idx = create_index(
        spark, docs,
        {"text": "text", "lang": "keyword", "source": "keyword",
         "n_chars": "long"},
        id_column="doc_id", path=f"{work}/idx", index_type="disk",
        re_create=True, cache=False,
    )

    t = time.time()
    segments.build_segments(idx)
    t_build = time.time() - t
    seg_bytes = sum(
        os.path.getsize(p) for p in glob.glob(
            f"{work}/idx/segments*/**/*.parquet", recursive=True)
    )

    queries = {
        "wand_or": lambda: wand.wand_topk(
            idx, "text", ["merge", "window", "scan"], k=10),
        "wand_and": lambda: wand.wand_topk(
            idx, "text", ["merge", "window"], k=10, mode="and"),
        "wand_phrase": lambda: wand.phrase_topk(
            idx, "text", ["merge", "window"], k=10),
    }
    out: dict[str, float] = {}
    for name, fn in queries.items():
        fn().collect()  # warm
        out[name] = round(min(_timed(fn) for _ in range(3)), 4)

    print(json.dumps({
        "tag": tag, "n_docs": n_docs, "build_segments": round(t_build, 3),
        "seg_bytes": seg_bytes, "queries": out,
    }))


def _timed(fn) -> float:
    t = time.time()
    fn().collect()
    return time.time() - t


if __name__ == "__main__":
    main()
