"""Compressed posting-segment build — the at-scale index artifact.

Layout (north_star: per-partition inverted-index segments as sorted
(term, docID-delta, tf) posting lists with varint block compression plus
per-block max-score metadata, merged via repartition-by-term-hash,
resumable from per-partition manifests):

    <index>/segments/bucket=<b>/*.parquet   one row per posting BLOCK:
        field, term, chunk, block_id, n, first_doc, last_doc,
        doc_deltas BINARY (varint gaps), tfs BINARY (varint),
        norms BINARY (1 byte/posting, SmallFloat byte4),
        positions BINARY (varint, per-posting delta runs),
        block_max_score FLOAT8
    <index>/manifests/bucket_<b>.json       lineage + metrics manifest

Scale/skew design:
- Buckets = ``pmod(xxhash64(term), n_buckets)`` — the repartition-by-
  term-hash merge. One BUCKET JOB per bucket, committed independently
  with its manifest; interrupted builds resume by skipping buckets whose
  manifest exists (write data THEN manifest, so a missing manifest means
  incomplete — SURVEY.md §7 hard-part #5).
- Hot terms do NOT skew the encode: the applyInPandas group key is
  (field, term, chunk) where ``chunk = doc_id // chunk_span`` — a
  stopword with 10^11 postings becomes 10^11/chunk_span bounded groups
  spread over all partitions. This is structural salting; no AQE luck
  needed.
- ``block_max_score`` is the exact BM25 score upper bound for the block
  (computed from the final corpus stats, like Lucene impacts after a
  merge), consumed by the WAND kernel (wand.py).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_clj_spark import bm25, codec

SEGMENT_SCHEMA = (
    "field string, term string, chunk long, block_id int, n int, "
    "first_doc long, last_doc long, doc_deltas binary, tfs binary, "
    "norms binary, positions binary, block_max_score double"
)

DEFAULT_CHUNK_SPAN = 1 << 17  # 131072 docs per chunk group
DEFAULT_BUCKETS = 16


def _encode_group_factory(stats: dict, block_size: int):
    """Returns the applyInPandas encoder for one (field, term, chunk)
    group. ``stats`` maps field -> {N, avgdl}; df arrives as a column."""

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        field = pdf["field"].iloc[0]
        term = pdf["term"].iloc[0]
        chunk = int(pdf["chunk"].iloc[0])
        df_ = int(pdf["df"].iloc[0])
        st = stats[field]
        n_docs, avgdl = int(st["N"]), float(st["avgdl"])
        idf = float(np.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5)))

        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["dl"].to_numpy(np.int64)
        norms = bm25.norm_byte_np(dls)
        has_pos = pdf["positions"].iloc[0] is not None
        out = []
        for b0 in range(0, len(pdf), block_size):
            sl = slice(b0, b0 + block_size)
            ids = doc_ids[sl]
            btf = tfs[sl]
            bnorm = norms[sl]
            qdl = bm25.LENGTH_TABLE[bnorm].astype(np.float64)
            scores = idf * btf / (
                btf + bm25.K1 * (1.0 - bm25.B + bm25.B * qdl / avgdl)
            )
            if has_pos:
                pos_list = [
                    np.asarray(p, dtype=np.int64)
                    for p in pdf["positions"].iloc[sl]
                ]
                pos_buf = codec.encode_positions(btf, pos_list)
            else:
                pos_buf = b""
            out.append(
                {
                    "field": field,
                    "term": term,
                    "chunk": chunk,
                    "block_id": b0 // block_size,
                    "n": len(ids),
                    "first_doc": int(ids[0]),
                    "last_doc": int(ids[-1]),
                    "doc_deltas": codec.encode_varints(
                        codec.delta_encode(ids).astype(np.uint64)
                    ),
                    "tfs": codec.encode_varints(btf.astype(np.uint64)),
                    "norms": bnorm.tobytes(),
                    "positions": pos_buf,
                    "block_max_score": float(scores.max()),
                }
            )
        return pd.DataFrame(out)

    return encode


def build_segments(
    index,
    path: str | None = None,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    chunk_span: int = DEFAULT_CHUNK_SPAN,
    block_size: int = codec.BLOCK_SIZE,
    resume: bool = True,
    lineage: dict | None = None,
    log=None,
    concurrency: int = 4,
) -> str:
    """Encode the index's postings into compressed segments, one
    committed job PER BUCKET (see module docstring). Returns the
    segments root path. Safe to interrupt and re-run with resume=True:
    finished buckets (manifest present) are skipped.

    ``concurrency`` bucket jobs run in flight at once (driver threads;
    Spark schedules concurrent jobs fine) — checkpoint granularity is
    unchanged because each bucket still writes its data before its own
    manifest, but the job-submission latency no longer serializes
    across n_buckets."""
    root = path or index.path
    if not root:
        raise ValueError("segments need a disk path (index.path or path=)")
    seg_root = os.path.join(root, "segments")
    man_root = os.path.join(root, "manifests")
    os.makedirs(seg_root, exist_ok=True)
    os.makedirs(man_root, exist_ok=True)

    post = index.postings.join(
        index.terms.select("field", "term", "df"), ["field", "term"]
    ).withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    encode = _encode_group_factory(index.stats, block_size)

    meta = {
        "n_buckets": n_buckets,
        "chunk_span": chunk_span,
        "block_size": block_size,
    }
    meta_path = os.path.join(man_root, "_segments_meta.json")
    if resume and os.path.exists(meta_path):
        with open(meta_path) as f:
            old = json.load(f)
        if {k: old.get(k) for k in meta} != meta:
            # skipping manifests written under different layout params
            # would silently mix pmod/chunk layouts in one segment set
            raise ValueError(
                "resume with different segment parameters: existing "
                f"{old} vs requested {meta}; pass resume=False to "
                "rebuild, or re-run with the original parameters"
            )
    elif resume:
        # meta file missing (or deleted) but bucket manifests may still
        # exist from an older build — each manifest embeds its layout
        # params, so validate those instead of skipping unchecked
        for fjson in sorted(os.listdir(man_root)):
            if not fjson.startswith("bucket_"):
                continue
            with open(os.path.join(man_root, fjson)) as f:
                man = json.load(f)
            if {k: man.get(k) for k in meta} != meta:
                raise ValueError(
                    f"resume: existing manifest {fjson} was written "
                    f"under different segment parameters "
                    f"({ {k: man.get(k) for k in meta} } vs requested "
                    f"{meta}) and no _segments_meta.json is present; "
                    "pass resume=False to rebuild, or re-run with the "
                    "original parameters"
                )
    if not resume:
        # fresh build: clear any previous layout so stale bucket dirs
        # (e.g. from a larger n_buckets) can't survive alongside
        import shutil

        for d in os.listdir(seg_root):
            shutil.rmtree(os.path.join(seg_root, d), ignore_errors=True)
        for fjson in os.listdir(man_root):
            if fjson.startswith("bucket_"):
                os.remove(os.path.join(man_root, fjson))
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1)

    def run_bucket(b: int) -> None:
        man_path = os.path.join(man_root, f"bucket_{b}.json")
        if resume and os.path.exists(man_path):
            # Validate the manifest's own embedded layout params before
            # skipping: if _segments_meta.json was missing/deleted (e.g.
            # a pre-guard build) the top-level check above never ran,
            # and skipping unchecked could mix pmod/chunk layouts — the
            # exact hazard the guard exists for (ADVICE r01).
            with open(man_path) as f:
                man = json.load(f)
            if {k: man.get(k) for k in meta} != meta:
                raise ValueError(
                    f"bucket {b} manifest was written under different "
                    f"segment parameters: existing "
                    f"{ {k: man.get(k) for k in meta} } vs requested "
                    f"{meta}; pass resume=False to rebuild, or re-run "
                    "with the original parameters"
                )
            if log:
                log(f"bucket {b}: manifest present, skipping (resume)")
            return
        t0 = time.time()
        part = post.filter(F.col("bucket") == b).drop("bucket")
        blocks = (
            part.withColumn(
                "chunk", (F.col("doc_id") / F.lit(chunk_span)).cast("long")
            )
            .groupBy("field", "term", "chunk")
            .applyInPandas(encode, SEGMENT_SCHEMA)
        )
        out_dir = os.path.join(seg_root, f"bucket={b}")
        (
            blocks.repartition(1)
            .sortWithinPartitions("field", "term", "chunk", "block_id")
            .write.mode("overwrite")
            .parquet(out_dir)
        )
        # metrics pass over what was written (cheap: local parquet)
        written = index.spark.read.parquet(out_dir)
        row = written.agg(
            F.count("*").alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.countDistinct("term").alias("n_terms"),
            F.max("last_doc").alias("max_doc"),
        ).collect()[0]
        manifest = {
            "bucket": b,
            "n_blocks": row["n_blocks"],
            "n_postings": int(row["n_postings"] or 0),
            "n_terms": row["n_terms"],
            "max_doc": row["max_doc"],
            "elapsed_sec": round(time.time() - t0, 3),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "lineage": lineage or {"source": index.path or "<memory>"},
            **meta,
        }
        # data first, manifest last: manifest presence == bucket committed
        with open(man_path, "w") as f:
            json.dump(manifest, f, indent=1)
        if log:
            log(
                f"bucket {b}: {row['n_blocks']} blocks, "
                f"{row['n_postings']} postings in {manifest['elapsed_sec']}s"
            )

    if concurrency > 1 and n_buckets > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(concurrency, n_buckets)) as pool:
            for fut in [pool.submit(run_bucket, b) for b in range(n_buckets)]:
                fut.result()  # surface the first failure
    else:
        for b in range(n_buckets):
            run_bucket(b)
    return seg_root


def segments_meta(root: str) -> dict:
    with open(os.path.join(root, "manifests", "_segments_meta.json")) as f:
        return json.load(f)
