"""Block-max WAND top-k over compressed segments.

The scale-path query kernel (north_star: "BM25 top-k retrieval using
block-max WAND posting-list intersection and a bounded min-heap"):

- Term selection prunes at THREE levels before any decode: parquet
  directory pruning on ``bucket=`` (same xxhash64 as the writer),
  row-group min/max skipping on the sorted ``term`` column, and the
  ``block_max_score`` metadata below.
- Blocks are co-located by doc range: ``repartitionByRange("chunk")``
  puts every query term's blocks for a doc interval in the same
  partition, so scoring is partition-local (one narrow shuffle of
  compressed blocks, no row-level shuffle ever).
- Inside each partition (Arrow-batched kernel): chunks are processed in
  DESCENDING upper-bound order (sum over terms of the chunk's max
  block_max_score). Once the bounded min-heap holds k results with
  min-score θ >= the next chunk's upper bound, the remaining chunks in
  the partition are skipped wholesale — the block-max WAND skip. Within
  a surviving chunk, per-block upper bounds skip individual blocks, and
  the actually-decoded blocks are scored fully vectorized (numpy varint
  decode + LUT norms).
- Partitions emit their local top-k; the driver-side
  ``orderBy(...).limit(k)`` (TakeOrderedAndProject) merges heaps.

Scores are computed with the same double-precision formula as the
DataFrame path (bm25.score_col), so the two execution strategies are
result-identical — pinned by tests/test_wand.py.
"""

from __future__ import annotations

import heapq
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_clj_spark import bm25, codec


def _kernel_factory(term_idfs: dict, n_docs: int, avgdl: float, k: int,
                    mode: str):
    """Per-partition WAND kernel for mapInPandas.

    ``term_idfs`` may carry WEIGHTED idfs (idf * per-term boost): the
    per-posting score and every block/chunk upper bound scale linearly
    in the weight, so the caller pre-scales both the idf map and the
    ``block_max_score`` column and the skip logic stays exact."""
    n_terms_required = len(term_idfs) if mode == "and" else 1

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # The partition's batches are materialized ONCE here, by design:
        # best-first processing needs the partition-wide chunk ordering
        # (descending upper bound), and per-doc aggregation needs every
        # block of a chunk together — both impossible over raw Arrow
        # batch boundaries without a partition-local sort that would
        # destroy the best-first order. Memory is bounded: these rows
        # are the QUERY TERMS' compressed blocks for this chunk range
        # only (already bucket/term-pruned at the scan), i.e.
        # O(#terms x chunks/partition x blocks/chunk) — raise
        # n_partitions to shrink the per-task footprint at scale.
        parts = list(batches)
        pdf = pd.concat(parts, ignore_index=True) if parts else None
        if pdf is None or len(pdf) == 0:
            yield pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
            return
        # norm -> k1*(1-b+b*qdl/avgdl) cache, like BM25Scorer's
        denom_cache = bm25.K1 * (
            (1.0 - bm25.B)
            + bm25.B * bm25.LENGTH_TABLE.astype(np.float64) / avgdl
        )
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap

        def theta() -> float:
            return heap[0][0] if len(heap) >= k else -math.inf

        # chunk upper bound = sum over terms of max block_max in chunk
        ub = (
            pdf.groupby(["chunk", "term"])["block_max_score"].max()
            .groupby("chunk").sum()
            .sort_values(ascending=False)
        )
        by_chunk = dict(tuple(pdf.groupby("chunk")))
        for chunk, upper in ub.items():
            # STRICT bound: a doc scoring exactly theta can still win
            # the (score desc, doc_id asc) tiebreak against the current
            # heap minimum, so ties must be decoded, not skipped
            if len(heap) >= k and upper < theta():
                break  # descending uppers: nothing below can qualify
            cpdf = by_chunk[chunk]
            if mode == "and" and cpdf["term"].nunique() < len(term_idfs):
                continue
            # per-term chunk maxima ONCE: a block's skip bound is its
            # own max + the sum of the OTHER terms' chunk maxima
            term_maxes = cpdf.groupby("term")["block_max_score"].max()
            tm_sum = float(term_maxes.sum())
            doc_parts, score_parts = [], []
            for row in cpdf.itertuples(index=False):
                others = tm_sum - float(term_maxes[row.term])
                if (
                    len(heap) >= k
                    and row.block_max_score + others < theta()
                ):
                    continue
                ids = codec.delta_decode(
                    codec.decode_varints(row.doc_deltas)
                )
                tfs = codec.decode_varints(row.tfs).astype(np.float64)
                norms = np.frombuffer(row.norms, dtype=np.uint8)
                idf = term_idfs[row.term]
                scores = idf * tfs / (tfs + denom_cache[norms])
                doc_parts.append(ids)
                score_parts.append(scores)
            if not doc_parts:
                continue
            docs = np.concatenate(doc_parts)
            scores = np.concatenate(score_parts)
            uniq, inv, counts = np.unique(
                docs, return_inverse=True, return_counts=True
            )
            agg = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(agg, inv, scores)
            if mode == "and":
                keep = counts >= n_terms_required
                uniq, agg = uniq[keep], agg[keep]
            for d, s in zip(uniq.tolist(), agg.tolist()):
                item = (s, -d)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
        out = pd.DataFrame(
            {
                "doc_id": [-nd for s, nd in heap],
                "score": [s for s, nd in heap],
            }
        ).astype({"doc_id": "int64", "score": "float64"})
        yield out

    return kernel


def _segment_scan(index, field: str, terms: list[str]):
    """Shared driver preamble for the segment kernels: validate the
    segments dir, resolve corpus stats and per-term idfs (one tiny
    terms-table action), resolve bucket literals (one tiny JVM eval of
    the writer's xxhash64), and return the bucket/term-filtered blocks
    scan. Returns (n_docs, avgdl, term_idfs, blocks) — term_idfs may
    be missing absent terms."""
    import os

    from lucene_clj_spark.segments import segments_meta

    root = index.path
    if not root or not os.path.isdir(os.path.join(root, "segments")):
        raise ValueError(
            "segment kernels need a disk index with built segments "
            "(run segments.build_segments first)"
        )
    meta = segments_meta(root)
    nb = meta["n_buckets"]
    st = index.field_stats(field)
    n_docs, avgdl = int(st["N"]), float(st["avgdl"])
    uniq = sorted(set(terms))
    df_rows = (
        index.terms.filter(
            (F.col("field") == field) & F.col("term").isin(uniq)
        )
        .select("term", "df")
        .collect()
    )
    term_idfs = {
        r["term"]: math.log(1.0 + (n_docs - r["df"] + 0.5) / (r["df"] + 0.5))
        for r in df_rows
    }
    present = sorted(term_idfs)
    if not present:
        return n_docs, avgdl, term_idfs, None
    bucket_row = (
        index.spark.range(1)
        .select(
            *[
                F.pmod(F.xxhash64(F.lit(t)), F.lit(nb)).alias(f"b{i}")
                for i, t in enumerate(present)
            ]
        )
        .collect()[0]
    )
    query_buckets = sorted({int(v) for v in bucket_row})
    blocks = (
        index.spark.read.parquet(os.path.join(root, "segments"))
        .filter(F.col("bucket").isin(query_buckets))
        .filter((F.col("field") == field) & F.col("term").isin(present))
    )
    return n_docs, avgdl, term_idfs, blocks


def _phrase_kernel_factory(
    offsets: dict, term_idfs: dict, idf_sum: float, avgdl: float, k: int,
):
    """Per-partition exact-adjacency phrase kernel over compressed
    segments. ``offsets`` maps term -> list of phrase offsets (handles
    duplicate terms). Chunk-level skipping uses the derived bound
    phrase_score <= idf_sum * min_t(chunk_max_block_score_t / idf_t)
    (valid because phrase freq <= every member tf and x/(x+d) is
    increasing in x)."""
    uniq_terms = list(offsets)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = list(batches)  # see wand kernel note on materialization
        pdf = pd.concat(parts, ignore_index=True) if parts else None
        empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
            {"doc_id": "int64", "score": "float64"}
        )
        if pdf is None or len(pdf) == 0:
            yield empty
            return
        denom_cache = bm25.K1 * (
            (1.0 - bm25.B)
            + bm25.B * bm25.LENGTH_TABLE.astype(np.float64) / avgdl
        )
        heap: list[tuple[float, int]] = []

        def theta() -> float:
            return heap[0][0] if len(heap) >= k else -math.inf

        tmax = pdf.groupby(["chunk", "term"])["block_max_score"].max()
        # chunk bound: idf_sum * min over phrase terms of (max block
        # score / idf); chunks missing any term can't match at all
        ub = {}
        for chunk, grp in tmax.groupby(level=0):
            per_term = grp.droplevel(0)
            if not all(t in per_term.index for t in uniq_terms):
                continue
            ub[chunk] = idf_sum * min(
                float(per_term[t]) / term_idfs[t] for t in uniq_terms
            )
        by_chunk = dict(tuple(pdf.groupby("chunk")))
        for chunk, upper in sorted(
            ub.items(), key=lambda kv: -kv[1]
        ):
            if len(heap) >= k and upper < theta():
                break
            cpdf = by_chunk[chunk]
            # Phase 1: decode ONLY doc ids (cheap) per term; positions
            # stay as raw varint buffers until a block is known to hold
            # a candidate — positions are the bulk of segment bytes, so
            # lazy decode skips most of the frequent term's blocks.
            per_term: dict = {}
            ok = True
            for t in uniq_terms:
                rows = cpdf[cpdf["term"] == t]
                blocks = []
                for row in rows.itertuples(index=False):
                    ids = codec.delta_decode(
                        codec.decode_varints(row.doc_deltas)
                    )
                    blocks.append(
                        {
                            "ids": ids,
                            "tfs_buf": row.tfs,
                            "norms": row.norms,
                            "pos_buf": row.positions,
                            "flat": None,  # decoded lazily
                        }
                    )
                if not blocks:
                    ok = False
                    break
                blocks.sort(key=lambda b: int(b["ids"][0]))
                all_ids = np.concatenate([b["ids"] for b in blocks])
                firsts = np.array(
                    [int(b["ids"][0]) for b in blocks], dtype=np.int64
                )
                per_term[t] = (all_ids, blocks, firsts)
            if not ok:
                continue
            cands = None
            for t in sorted(
                uniq_terms, key=lambda t: per_term[t][0].size
            ):
                cands = (
                    per_term[t][0]
                    if cands is None
                    else np.intersect1d(
                        cands, per_term[t][0], assume_unique=True
                    )
                )

            def doc_positions(t, d):
                """Positions (and norm byte) of doc d for term t —
                decodes the containing block's streams (via the codec)
                on first touch; untouched blocks never decode."""
                _, blocks, firsts = per_term[t]
                bi = int(np.searchsorted(firsts, d, side="right")) - 1
                b = blocks[bi]
                if b["flat"] is None:
                    tfs = codec.decode_varints(b["tfs_buf"]).astype(
                        np.int64
                    )
                    b["flat"] = codec.decode_positions(b["pos_buf"], tfs)
                    b["norms_a"] = np.frombuffer(
                        b["norms"], dtype=np.uint8
                    )
                i = int(np.searchsorted(b["ids"], d))
                return b["flat"][i], int(b["norms_a"][i])

            for d in cands.tolist():
                inter = None
                norm = None
                for t, offs in offsets.items():
                    p, norm = doc_positions(t, d)
                    for off in offs:
                        shifted = p - off
                        inter = (
                            shifted
                            if inter is None
                            else np.intersect1d(
                                inter, shifted, assume_unique=True
                            )
                        )
                        if inter.size == 0:
                            break
                    if inter is not None and inter.size == 0:
                        break
                freq = 0 if inter is None else int(inter.size)
                if freq == 0:
                    continue
                score = (
                    idf_sum * freq / (freq + denom_cache[norm])
                )
                item = (float(score), -d)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
        yield pd.DataFrame(
            {
                "doc_id": [-nd for s, nd in heap],
                "score": [s for s, nd in heap],
            }
        ).astype({"doc_id": "int64", "score": "float64"})

    return kernel


def phrase_topk(
    index,
    field: str,
    terms: list[str],
    k: int = 10,
    n_partitions: int | None = None,
) -> DataFrame:
    """Exact-adjacency (slop 0) phrase top-k over the compressed
    segments — positions decode from the varint stream inside the
    kernel, so a phrase never shuffles raw postings. Result-identical
    to the DataFrame ``_scored_phrase`` path (PhraseQuery weight:
    idf_sum with per-occurrence counts, shared phrase freq, quantized
    norms)."""
    offsets: dict[str, list[int]] = {}
    for i, t in enumerate(terms):
        offsets.setdefault(t, []).append(i)
    _, avgdl, term_idfs, blocks = _segment_scan(index, field, terms)
    if blocks is None or len(term_idfs) < len(offsets):
        # a phrase term absent from the dictionary -> no match
        return index.spark.createDataFrame([], "doc_id long, score double")
    idf_sum = sum(term_idfs[t] * len(offs) for t, offs in offsets.items())

    npart = n_partitions or index.spark.sparkContext.defaultParallelism
    co = blocks.repartitionByRange(npart, "chunk")
    kernel = _phrase_kernel_factory(offsets, term_idfs, idf_sum, avgdl, k)
    local = co.mapInPandas(kernel, "doc_id long, score double")
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def wand_topk(
    index,
    field: str,
    terms: list[str],
    k: int = 10,
    mode: str = "or",
    n_partitions: int | None = None,
    term_weights: dict | None = None,
) -> DataFrame:
    """Top-k (doc_id, score) for a multi-term query over the compressed
    segments, via the block-max kernel. ``mode`` = 'or' (SHOULD sum) or
    'and' (MUST intersection, scores summed). ``term_weights`` scales
    each term's contribution (query boosts / fuzzy closeness boosts):
    scores and skip bounds both scale linearly, so pruning stays
    exact."""
    weights = term_weights or {}
    n_docs, avgdl, term_idfs, blocks = _segment_scan(index, field, terms)
    if blocks is None:
        return index.spark.createDataFrame([], "doc_id long, score double")
    term_idfs = {
        t: weights.get(t, 1.0) * idf for t, idf in term_idfs.items()
    }
    if weights:
        # skip bounds must scale with the weighted scores
        wmap = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv]
        )
        blocks = blocks.withColumn(
            "block_max_score",
            F.col("block_max_score")
            * F.coalesce(wmap[F.col("term")], F.lit(1.0)),
        )

    npart = n_partitions or index.spark.sparkContext.defaultParallelism
    co = blocks.repartitionByRange(npart, "chunk")
    kernel = _kernel_factory(term_idfs, n_docs, avgdl, k, mode)
    local = co.mapInPandas(kernel, "doc_id long, score double")
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
